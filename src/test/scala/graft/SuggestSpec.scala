package graft

import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.{IndexBuilder, Mutations}
import graft.query.QueryEngine

/** Spelling suggestion: driver-side replay (full dictionary + DP
  * Levenshtein + the (edist, -df, term) ranking) as the ground truth.
  */
class SuggestSpec extends TestBase {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def truth(df: Map[String, Long], q: String): Option[(String, Long)] = {
    val cand = df.toSeq.map { case (t, n) => (t, n, lev(q, t)) }
      .filter(_._3 <= 1)
    if (cand.isEmpty) None
    else {
      val (t, n, _) = cand.minBy { case (t, n, e) => (e, -n, t) }
      Some((t, n))
    }
  }

  test("suggest == driver replay; exact terms suggest themselves") {
    val src = tools.SourceCodeGen.generate(spark, 400).cache()
    val idx = IndexBuilder.build(src, "doc_id", Seq("content")).cached()
    val dfMap = src.select(col("content")).collect()
      .flatMap(r => Analyzer.tokenize(r.getString(0)))
      .groupBy(identity).map { case (t, os) => t -> os.length.toLong }
    val queries = Seq("improt", "vall", "ident1", "zzznothing", "Modul")
    val got = QueryEngine.suggest(idx, queries).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    for (q <- queries) assert(got.get(q) == truth(dfMap, q), s"query '$q'")
    assert(got("ident1") == (("ident1", dfMap("ident1")))) // exact → itself
    assert(!got.contains("zzznothing"))
    idx.unpersist(); src.unpersist()
  }

  test("over-cap window fallback == collected ranking") {
    val src = tools.SourceCodeGen.generate(spark, 400).cache()
    val idx = IndexBuilder.build(src, "doc_id", Seq("content")).cached()
    val qs = Seq("improt", "vall", "Modul")
    val a = QueryEngine.suggest(idx, qs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val b = QueryEngine.suggest(idx, qs, maxCollectedExpansions = 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
    idx.unpersist(); src.unpersist()
  }

  test("tombstones flip the ranking via the live-df recount") {
    import spark.implicits._
    // doc 1 carries term "aa" ×5; docs 2-4 carry "ab" ×1 each. Query "ac"
    // is distance 1 from both. With doc 1 live: aa (df 5) wins. Delete
    // doc 1: aa's live df is 0 (term vanishes) → ab (df 3) wins.
    val df = Seq(
      (1L, "aa aa aa aa aa"),
      (2L, "ab x"), (3L, "ab y"), (4L, "ab z")).toDF("doc_id", "text")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
    val before = QueryEngine.suggest(idx, Seq("ac")).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(before == Seq(("aa", 5L)))
    val after = QueryEngine.suggest(
      Mutations.removeDocuments(idx, Seq(1L)), Seq("ac")).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(after == Seq(("ab", 3L)))
    // the over-cap fallback applies the same recount
    val afterFb = QueryEngine.suggest(
      Mutations.removeDocuments(idx, Seq(1L)), Seq("ac"),
      maxCollectedExpansions = 0).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(afterFb == Seq(("ab", 3L)))
  }
}
