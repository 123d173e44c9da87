package graft

import graft.index.Mutations
import graft.score.BM25

/** Every BM25 golden vector from the reference test suites.
  * Sources: /root/reference/src/query.rs:166-338,
  * /root/reference/src/score/default/bm25.rs:96-137,
  * /root/reference/tests/integrations_tests.rs:27-93,
  * /root/reference/tests/document_frequency.rs:5-32.
  */
class GoldenBm25Spec extends TestBase {

  // --- src/score/default/bm25.rs tests (single-field corpus) ---

  test("bm25: single term returns doc 0 (bm25.rs:104-116)") {
    val idx = buildTitleIndex(Seq("a b c", "c d e"))
    assertQuery(idx, "a", BM25(), Seq((0L, 0.6931471805599453)))
  }

  test("bm25: shared term returns both docs (bm25.rs:118-136)") {
    val idx = buildTitleIndex(Seq("a b c", "c d e"))
    assertQuery(idx, "c", BM25(),
      Seq((0L, 0.1823215567939546), (1L, 0.1823215567939546)))
  }

  // --- src/query.rs tests (two-field corpus) ---

  private def queryCorpus = buildTwoFieldIndex(Seq(
    (1L, "a b c", "hello world"),
    (2L, "c d e", "lorem ipsum")))

  test("query: 'a' returns doc 1 (query.rs:182-211)") {
    assertQuery(queryCorpus, "a", BM25(), Seq((1L, 0.6931471805599453)))
  }

  test("query: 'c' returns both docs (query.rs:213-258)") {
    assertQuery(queryCorpus, "c", BM25(),
      Seq((1L, 0.1823215567939546), (2L, 0.1823215567939546)))
  }

  test("query: 'h' expands to 'hello' (query.rs:260-292)") {
    assertQuery(queryCorpus, "h", BM25(), Seq((1L, 0.12637567304702957)))
  }

  test("query: 'a d' is a disjunction (query.rs:294-338)") {
    assertQuery(queryCorpus, "a d", BM25(),
      Seq((1L, 0.6931471805599453), (2L, 0.6931471805599453)))
  }

  // --- tests/integrations_tests.rs lifecycle ---

  test("lifecycle: add, query, remove, vacuum (integrations_tests.rs:27-93)") {
    val idx = buildTwoFieldIndex(Seq(
      (0L, "abc", "dfg"),
      (1L, "dfgh", "abcd")))
    assertQuery(idx, "abc", BM25(),
      Seq((0L, 0.6931471805599453), (1L, 0.28104699650060755)))

    val removed = Mutations.removeDocuments(idx, Seq(0L))
    val vacuumed = Mutations.vacuum(removed)
    assertQuery(vacuumed, "abc", BM25(), Seq((1L, 0.1166450426074421)))
    // tombstone-only (pre-vacuum) must give identical scores — the
    // reference filters removed pointers and uses updated stats at query
    // time (query.rs:65, index.rs:175-183)
    assertQuery(removed, "abc", BM25(), Seq((1L, 0.1166450426074421)))
  }

  // --- tests/document_frequency.rs regression ---

  test("df > N must not fail and idf stays clamped (document_frequency.rs)") {
    import spark.implicits._
    val df = Seq((0L, "this is text with lots of the, the, the, the")).toDF("id", "content")
    val idx = graft.index.IndexBuilder.build(df, "id", Seq("content"))
    // occurrence-df: "the," appears 3 times (plus "the" once) — df of
    // expanded term "the," is 3 > N=1; min(N, df) clamps, idf = ln(1+0.5/1.5)
    val res = runQuery(idx, "What did the author do growing up?", BM25())
    assert(res.nonEmpty)
    assert(res.forall(_._2 > 0))
  }

  // --- empty/edge queries ---

  test("empty query returns nothing") {
    val idx = buildTitleIndex(Seq("a b c"))
    assert(runQuery(idx, "", BM25()).isEmpty)
    assert(runQuery(idx, "   ", BM25()).isEmpty)
    assert(runQuery(idx, "zzz", BM25()).isEmpty)
  }

  test("field boosts weight fields (2x title boost)") {
    val idx = buildTwoFieldIndex(Seq(
      (0L, "abc", "dfg"),
      (1L, "dfgh", "abcd")))
    val boosted = runQuery(idx, "abc", BM25(), Seq(2.0, 1.0))
    val plain = runQuery(idx, "abc", BM25(), Seq(1.0, 1.0))
    // doc 0 matches in title (boost 2 doubles it), doc 1 via description
    assert(math.abs(boosted.head._2 - 2 * plain.head._2) < 1e-12)
  }
}
