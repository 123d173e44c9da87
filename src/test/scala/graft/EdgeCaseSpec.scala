package graft

import graft.pipeline.Dedup
import graft.score.{BM25, ZeroToOne}

/** Semantics edge cases derived from the reference but not covered by its
  * published golden vectors — expectations computed by hand from the exact
  * formulas (SURVEY.md §2.3).
  */
class EdgeCaseSpec extends TestBase {

  test("expansion boost uses UTF-8 BYTE lengths (Rust str::len parity)") {
    // doc "café": query "caf" expands to "café" (5 BYTES, 4 chars).
    // boost = ln(1 + 1/(1 + 5 - 3)) = ln(4/3); with char lengths it would
    // be ln(3/2) — this test pins the byte semantics.
    val idx = buildTitleIndex(Seq("café"))
    val idf = math.log(1.0 + 0.5 / 1.5) // N=1, df=1 ⇒ ln(4/3)
    val boost = math.log(1.0 + 1.0 / (1.0 + 5.0 - 3.0))
    // tf=1, fl=1, avg=1 ⇒ tf-norm = 1 exactly
    assertQuery(idx, "caf", BM25(), Seq((0L, idf * boost)))
  }

  test("zero-to-one entry score uses byte lengths too") {
    // score = 1 - |5-3|/5 = 0.6; contribution min(0.6/1,1)*1/max(1,1)
    val idx = buildTitleIndex(Seq("café"))
    assertQuery(idx, "caf", ZeroToOne(), Seq((0L, 0.6)))
  }

  test("duplicate query terms sum per occurrence (reference merge rule)") {
    val idx = buildTitleIndex(Seq("a b c", "c d e"))
    assertQuery(idx, "a a", BM25(), Seq((0L, 2 * 0.6931471805599453)))
  }

  test("null/empty field docs still count in N and avg") {
    import spark.implicits._
    val df = Seq((0L, null.asInstanceOf[String]), (1L, "abc")).toDF("id", "title")
    val idx = graft.index.IndexBuilder.build(df, "id", Seq("title"))
    val st = idx.fieldStats()
    assert(st.n == 2 && st.sums.toSeq == Seq(1L) && st.avgs.toSeq == Seq(0.5))
    // N=2, df=1 ⇒ idf=ln(2); fl=1, avg=0.5 ⇒ tfn=2.2/(1.2*(0.25+0.75*2)+1)
    val expected = 2.2 / (1.2 * (0.25 + 0.75 * (1.0 / 0.5)) + 1.0) * math.log(2.0)
    assertQuery(idx, "abc", BM25(), Seq((1L, expected)))
  }

  test("query term longer than any indexed term matches nothing") {
    val idx = buildTitleIndex(Seq("ab"))
    assert(runQuery(idx, "abc", BM25()).isEmpty)
  }

  test("whole-corpus prefix (every term expands) stays correct") {
    val idx = buildTitleIndex(Seq("aa ab", "ac ad"))
    // "a" expands to all 4 terms; every doc matches twice within one qterm
    val res = runQuery(idx, "a", BM25())
    assert(res.map(_._1) == Seq(0L, 1L))
    assert(math.abs(res(0)._2 - res(1)._2) < 1e-12) // symmetric corpus
  }

  test("dropExactDups keeps the min-id survivor per content group") {
    import spark.implicits._
    val docs = Seq((5L, "x y"), (2L, "x y"), (9L, "X  y"), (7L, "unique"))
      .toDF("doc_id", "text")
    val out = Dedup.dropExactDups(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 7L)) // 5,9 are normalized dups of 2
  }

  test("maxCollectedExpansions fallback path gives identical results") {
    val idx = buildTitleIndex(Seq("aa ab ac", "ad ae af"))
    val collected = graft.query.QueryEngine.query(idx, "a", BM25())
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fallback = graft.query.QueryEngine.query(idx, "a", BM25(),
      maxCollectedExpansions = 2) // forces the startsWith DF path
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(collected == fallback && collected.nonEmpty)
  }
}
