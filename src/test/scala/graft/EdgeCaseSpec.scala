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

  test("merge rule canonicalization: Σ_qterms max_expansions (documented divergence)") {
    // Multi-term prefix query where the expansion sets overlap in matched
    // docs — the case where the reference's insertion-order-dependent fold
    // (max against the running cross-term total, query.rs:150-164) can
    // diverge from our canonical order-independent form. Pin OUR semantics:
    //   score(doc) = Σ over query terms of (max over that term's expansions).
    // Corpus: doc0 = "spar spark", doc1 = "spark".
    // Query "spar s": qt0="spar" expands to {spar, spark}, qt1="s" to the
    // same set. For doc0 (fl=2): both "spar"(tf=1) and "spark"(tf=1) match
    // under BOTH query terms.
    val idx = buildTitleIndex(Seq("spar spark", "spark"))
    val n = 2.0; val avg = 1.5
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def tfn(tf: Double, fl: Double) =
      (1.2 + 1.0) * tf / (1.2 * ((1 - 0.75) + 0.75 * fl / avg) + tf)
    def eboost(le: Int, lq: Int) =
      if (le == lq) 1.0 else math.log(1.0 + 1.0 / (1.0 + le - lq))
    // per-expansion term scores for doc0 (fl=2), df(spar)=1, df(spark)=2:
    val sparUnderSpar  = tfn(1, 2) * idf(1) * eboost(4, 4)
    val sparkUnderSpar = tfn(1, 2) * idf(2) * eboost(5, 4)
    val sparUnderS     = tfn(1, 2) * idf(1) * eboost(4, 1)
    val sparkUnderS    = tfn(1, 2) * idf(2) * eboost(5, 1)
    val doc0 = math.max(sparUnderSpar, sparkUnderSpar) +
      math.max(sparUnderS, sparkUnderS)
    // doc1 (fl=1): only "spark" matches, under both query terms
    val doc1 = tfn(1, 1) * idf(2) * eboost(5, 4) + tfn(1, 1) * idf(2) * eboost(5, 1)
    val got = runQuery(idx, "spar s", BM25()).toMap
    assert(math.abs(got(0L) - doc0) < 1e-12, s"doc0: ${got(0L)} vs $doc0")
    assert(math.abs(got(1L) - doc1) < 1e-12, s"doc1: ${got(1L)} vs $doc1")
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
