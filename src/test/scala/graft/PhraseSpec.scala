package graft

import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.{IndexBuilder, PostingBlocks}
import graft.query.{BlockMaxTopK, QueryEngine}
import graft.score.BM25

/** Phrase matching: two-phase match+verify ([[QueryEngine.phraseFilter]]).
  * Ground truth is always recomputed from first principles (driver-side
  * sliding-window scan over the tokenized corpus), never from the engine.
  */
class PhraseSpec extends TestBase {

  private def groundTruth(rows: Seq[(Long, String)], phrase: Seq[String]): Set[Long] =
    rows.collect { case (id, text)
      if Analyzer.tokenize(text).sliding(phrase.length).exists(_ == phrase) => id
    }.toSet

  test("phraseFilter == sliding-window ground truth on the generated corpus") {
    import spark.implicits._
    val src = tools.SourceCodeGen.generate(spark, 1000).cache()
    val idx = IndexBuilder.build(src, "doc_id", Seq("content")).cached()
    val rows = src.select(col("doc_id"), col("content")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    var nonEmptyCount = 0
    for (phrase <- Seq("import ident1", "val ident2", "import val")) {
      val want = groundTruth(rows, Analyzer.tokenize(phrase))
      val got = QueryEngine.phraseFilter(idx, src, "doc_id", Seq("content"), phrase)
        .collect().map(_.getLong(0)).toSet
      assert(got == want, s"phrase '$phrase': got ${got.size}, want ${want.size}")
      nonEmptyCount += (if (want.nonEmpty) 1 else 0)
    }
    assert(nonEmptyCount > 0, "all test phrases vacuous — pick hotter phrases")
    idx.unpersist(); src.unpersist()
  }

  test("adjacency is required: both-terms-present but non-adjacent does not match") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c"),     // adjacent
      (2L, "a c b"),     // both present, not adjacent
      (3L, "x a  b y"),  // double space: empties dropped, still adjacent
      (4L, "b a"),       // reversed
      (5L, "a b a b")    // repeated
    ).toDF("doc_id", "text")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
    val got = QueryEngine.phraseFilter(idx, df, "doc_id", Seq("text"), "a b")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L, 5L))
  }

  test("slop: ordered per-gap proximity == hand truth; monotone in slop") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b"),        // adjacent
      (2L, "a x b"),      // 1 intervening
      (3L, "a x y b"),    // 2 intervening
      (4L, "a x y z b"),  // 3 intervening — beyond slop 2
      (5L, "b x a"),      // wrong order never matches
      (6L, "a b c a x c") // 3-term chains get a PER-GAP budget
    ).toDF("doc_id", "text")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
    def run(p: String, slop: Int) =
      QueryEngine.phraseFilter(idx, df, "doc_id", Seq("text"), p, slop = slop)
        .collect().map(_.getLong(0)).toSet
    assert(run("a b", 0) == Set(1L, 6L))
    assert(run("a b", 1) == Set(1L, 2L, 6L))
    assert(run("a b", 2) == Set(1L, 2L, 3L, 6L))
    assert(run("a b", 3) == Set(1L, 2L, 3L, 4L, 6L))
    // 'a c': doc 6 has both 'a b c' (gap 1) and 'a x c' (gap 1)
    assert(run("a c", 0) == Set.empty && run("a c", 1) == Set(6L))
    // 3-term chain 'a b c' exact; 'a c a' needs slop on BOTH gaps
    assert(run("a b c", 0) == Set(6L))
    assert(run("c a c", 1) == Set(6L)) // c [b skipped? no: 'c a x c'] gaps 0,1
  }

  test("slop terms are regex-escaped ('.' is a literal, not a wildcard)") {
    import spark.implicits._
    val df = Seq(
      (1L, "x . bar"),  // literal dot one token before bar
      (2L, "q bar .")   // contains both tokens, but '. bar' never in order
    ).toDF("doc_id", "text")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
    val got = QueryEngine.phraseFilter(idx, df, "doc_id", Seq("text"),
      ". bar", slop = 1).collect().map(_.getLong(0)).toSet
    // an unescaped '.' would also match doc 2 (' q bar ' ⊃ ' <any> bar ')
    assert(got == Set(1L))
  }

  test("slop on the generated corpus: superset of exact, equal at slop 0") {
    val src = tools.SourceCodeGen.generate(spark, 800).cache()
    val idx = IndexBuilder.build(src, "doc_id", Seq("content")).cached()
    val rows = src.select(col("doc_id"), col("content")).collect()
      .map(r => (r.getLong(0), Analyzer.tokenize(r.getString(1)))).toSeq
    val (t1, t2) = ("import", "ident1")
    def truth(slop: Int): Set[Long] = rows.collect { case (id, ts)
      if ts.zipWithIndex.exists { case (x, i) => x == t1 &&
        (i + 1 to math.min(ts.length - 1, i + 1 + slop))
          .exists(j => ts(j) == t2) } => id
    }.toSet
    def run(slop: Int) = QueryEngine.phraseFilter(idx, src, "doc_id",
      Seq("content"), s"$t1 $t2", slop = slop)
      .collect().map(_.getLong(0)).toSet
    val exact = run(0)
    for (s <- Seq(0, 1, 3)) {
      val g = run(s)
      assert(g == truth(s), s"slop $s: got ${g.size}, want ${truth(s).size}")
      assert(exact.subsetOf(g))
    }
    assert(truth(3).size > exact.size, "slop never widened — vacuous fixture")
    idx.unpersist(); src.unpersist()
  }

  test("single-token phrase == docs containing the exact term") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, "alphabet"), (3L, "beta alpha"))
      .toDF("doc_id", "text")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
    val got = QueryEngine.phraseFilter(idx, df, "doc_id", Seq("text"), "alpha")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L)) // NOT the prefix match "alphabet"
  }

  test("a phrase never spans a field boundary; missing term empties strictly") {
    import spark.implicits._
    val df = Seq((1L, "x y a", "b z"), (2L, "a b", "q")).toDF("doc_id", "f1", "f2")
    val idx = IndexBuilder.build(df, "doc_id", Seq("f1", "f2"))
    val got = QueryEngine.phraseFilter(idx, df, "doc_id", Seq("f1", "f2"), "a b")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L)) // doc 1 has 'a' ending f1 and 'b' starting f2
    assert(QueryEngine.phraseFilter(idx, df, "doc_id", Seq("f1", "f2"),
      "a zzznope").isEmpty)
    assert(QueryEngine.phraseFilter(idx, df, "doc_id", Seq("f1", "f2"),
      "  ").isEmpty)
  }

  test("over-cap semi-join fallback == collected path") {
    import spark.implicits._
    val src = tools.SourceCodeGen.generate(spark, 600).cache()
    val idx = IndexBuilder.build(src, "doc_id", Seq("content")).cached()
    val a = QueryEngine.phraseFilter(idx, src, "doc_id", Seq("content"),
      "import ident1").collect().map(_.getLong(0)).toSet
    val b = QueryEngine.phraseFilter(idx, src, "doc_id", Seq("content"),
      "import ident1", maxCollectedCandidates = 1).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    idx.unpersist(); src.unpersist()
  }

  test("code-tokenizer phrase: punctuation tokens match adjacently across glyphs") {
    import spark.implicits._
    val df = Seq(
      (1L, "foo.bar(x)"),   // foo . bar — adjacent under the code tokenizer
      (2L, "foo . bar"),    // same token stream spelled with spaces
      (3L, "foo.baz.bar"),  // foo . baz . bar — not adjacent
      (4L, "barfoo.bar")    // barfoo . bar — 'foo' not a token
    ).toDF("doc_id", "text")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"),
      tokenizer = Analyzer.codeTokensCol)
    val got = QueryEngine.phraseFilter(idx, df, "doc_id", Seq("text"),
      "foo . bar", tokenizer = Analyzer.codeTokenizeRaw,
      tokensCol = Analyzer.codeTokensCol)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("phraseQuery == query restricted to the phrase set, and WAND agrees") {
    import spark.implicits._
    val src = tools.SourceCodeGen.generate(spark, 1200).cache()
    val idx = IndexBuilder.build(src, "doc_id", Seq("content")).cached()
    val blocks = PostingBlocks.fromPostings(idx.postings, 1, blockSize = 128).cache()
    val phrase = "import ident1"
    val pset = QueryEngine.phraseFilter(idx, src, "doc_id", Seq("content"),
      phrase).collect().map(_.getLong(0)).toSet
    val unf = QueryEngine.query(idx, phrase, BM25()).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pq = QueryEngine.phraseQuery(idx, src, "doc_id", Seq("content"),
      phrase, BM25()).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pq == unf.filter { case (id, _) => pset(id) } && pq.nonEmpty)
    val wand = BlockMaxTopK.query(idx, blocks, phrase, BM25(), k = 10,
      blockSize = 128, docFilter = Some(
        QueryEngine.phraseFilter(idx, src, "doc_id", Seq("content"), phrase)))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(wand == pq.take(10))
    idx.unpersist(); blocks.unpersist(); src.unpersist()
  }
}
