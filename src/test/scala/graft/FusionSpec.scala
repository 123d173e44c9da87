package graft

import org.apache.spark.sql.functions._

import graft.query.Fusion

/** Post-retrieval combinators (RRF fusion, field collapse, function
  * score): ground truth recomputed driver-side from the raw lists.
  */
class FusionSpec extends TestBase {
  import spark.implicits._

  private def rrfExpected(lists: Seq[Seq[(Long, Long)]], rrfK: Int,
      maxRank: Int): Map[Long, Double] = {
    val contribs = lists.flatMap { l =>
      l.sortBy { case (id, m) => (-m, id) }.zipWithIndex
        .collect { case ((id, _), i) if i < maxRank => id -> 1.0 / (rrfK + i + 1) }
    }
    contribs.groupBy(_._1).map { case (id, cs) => id -> cs.map(_._2).sum }
  }

  test("rrf == driver replay (overlap, disjoint ids, tie ranks, maxRank cut)") {
    // ties on score (ids 5 and 6 at m=40) must rank by id asc; id 9 is
    // vector-only, id 1 lexical-only; maxRank=3 drops the tail of list A
    val a = Seq(1L -> 100L, 2L -> 90L, 5L -> 40L, 6L -> 40L, 7L -> 10L)
    val b = Seq(2L -> 70L, 9L -> 60L, 5L -> 50L)
    val got = Fusion.rrf(
      Seq(a.toDF("doc_id", "m"), b.toDF("doc_id", "m")),
      "doc_id", "m", rrfK = 60, maxRank = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = rrfExpected(Seq(a, b), 60, 3)
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-12, s"doc $id: $s vs ${want(id)}") }
    // output order: fused desc, id asc
    assert(got.toSeq == got.toSeq.sortBy { case (id, s) => (-s, id) })
    // topK cut
    val cut = Fusion.rrf(
      Seq(a.toDF("doc_id", "m"), b.toDF("doc_id", "m")),
      "doc_id", "m", rrfK = 60, maxRank = 3, topK = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(cut == got.toSeq.map(_._1).take(2))
  }

  test("collapseTop == per-group argmax with (score desc, id asc) ties") {
    val res = Seq(1L -> 50L, 2L -> 90L, 3L -> 90L, 4L -> 10L, 5L -> 70L)
      .toDF("doc_id", "score_micro")
    val attrs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "y"),
      (6L, "z")) // id 6 has no hit — group z must be absent
      .toDF("doc_id", "grp")
    val got = Fusion.collapseTop(res, attrs, "doc_id", "grp", "score_micro")
      .select("doc_id", "grp").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // group x: 2 and 3 tie at 90 -> id 2 wins; group y: 5 at 70
    assert(got == Set((2L, "x"), (5L, "y")))
    val two = Fusion.collapseTop(res, attrs, "doc_id", "grp", "score_micro",
      perGroup = 2).collect().map(_.getLong(0)).toSet
    assert(two == Set(2L, 3L, 5L, 4L))
  }

  test("rescore == windowed blend replay (window cut, missing secondary, ties)") {
    // first-phase scores: ids 3 and 4 tie at 80 -> id 3 enters a window
    // of 3 (cut is (m desc, id asc)); id 4 is OUTSIDE the window even
    // though its secondary signal would have ranked it first
    val lex = Seq(1L -> 100L, 2L -> 90L, 3L -> 80L, 4L -> 80L, 5L -> 10L)
      .toDF("doc_id", "m")
    // id 2 missing from secondary -> contributes 0; id 4's huge signal
    // must be ignored (outside window)
    val sec = Seq(1L -> 5L, 3L -> 50L, 4L -> 999L, 5L -> 7L)
      .toDF("doc_id", "cos_m")
    val got = Fusion.rescore(lex, "doc_id", "m", sec, "cos_m",
      windowSize = 3, queryWeight = lit(1L), rescoreWeight = lit(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // window = {1(100), 2(90), 3(80)}; blended = 1*m + 2*sec
    assert(got == Seq(3L -> 180L, 1L -> 110L, 2L -> 90L))
    // topK cut
    val cut = Fusion.rescore(lex, "doc_id", "m", sec, "cos_m",
      windowSize = 3, rescoreWeight = lit(2L), topK = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(cut == Seq(3L, 1L))
  }

  test("functionScore multiplies by the attribute factor") {
    val res = Seq(1L -> 2.0, 2L -> 3.0).toDF("doc_id", "score")
    val attrs = Seq((1L, 100L), (2L, 300L)).toDF("doc_id", "n_chars")
    val got = Fusion.functionScore(res, attrs, "doc_id", Seq("n_chars"),
      "score", lit(1000.0) / (lit(1000L) + col("n_chars")))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(got(1L) - 2.0 * 1000.0 / 1100.0) < 1e-12)
    assert(math.abs(got(2L) - 3.0 * 1000.0 / 1300.0) < 1e-12)
    // factor columns are dropped from the output
    val cols = Fusion.functionScore(res, attrs, "doc_id", Seq("n_chars"),
      "score", lit(2.0)).columns.toSeq
    assert(cols == Seq("doc_id", "score"))
  }
}
