package graft

import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, InvertedIndex, Mutations, PostingBlocks}
import graft.query.{BlockMaxTopK, QueryEngine}
import graft.score.{BM25, ZeroToOne}
import graft.tools.SourceCodeGen

/** The round-5 closing operators: shard merge, regex term search, and
  * minimum-should-match. Each is pinned against an INDEPENDENT
  * recomputation (single-build index for merge, per-doc slot counting for
  * m-of-n, variant-union semantics for regex) so the operator can't drift
  * from the composition it claims to be.
  */
class MergeRegexMinMatchSpec extends TestBase {

  private def results(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  // ---------------------------------------------------------------- merge

  test("shard merge == single build (scores, stats, dictionary)") {
    import spark.implicits._
    val src = SourceCodeGen.generate(spark, 600)
    val full = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val a = IndexBuilder.build(src.filter(col("doc_id") % 2 === 0),
      "doc_id", Seq("content", "path"))
    val b = IndexBuilder.build(src.filter(col("doc_id") % 2 === 1),
      "doc_id", Seq("content", "path"))
    val merged = InvertedIndex.merge(a, b).cached()

    // global stats fold exactly (N additive, per-field sums additive)
    val fs = full.fieldStats(); val ms = merged.fieldStats()
    assert(ms.n == fs.n && ms.sums.sameElements(fs.sums))

    // dictionary df is the occurrence sum across shards
    val fd = full.termdict.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val md = merged.termdict.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(md == fd)

    // per-doc scores identical on both models, several query shapes
    for (model <- Seq[graft.score.ScoreModel](BM25(), ZeroToOne());
         q <- Seq("import", "ident1 val", "Modu def")) {
      val f = results(QueryEngine.query(full, q, model))
      val m = results(QueryEngine.query(merged, q, model))
      assert(m == f, s"merged != single-build for '$q' under $model")
      assert(m.nonEmpty)
    }
    full.unpersist(); merged.unpersist()
  }

  test("shard merge respects shard tombstones and folds statsHint only when clean") {
    import spark.implicits._
    val src = SourceCodeGen.generate(spark, 300)
    val a0 = IndexBuilder.build(src.filter(col("doc_id") % 2 === 0),
      "doc_id", Seq("content", "path"))
    val b = IndexBuilder.build(src.filter(col("doc_id") % 2 === 1),
      "doc_id", Seq("content", "path"))
    val removed = src.filter(col("doc_id") % 2 === 0)
      .select("doc_id").limit(3).collect().map(_.getLong(0)).toSeq
    val a = Mutations.removeDocuments(a0, removed)
    val merged = InvertedIndex.merge(a, b)
    assert(merged.hasTombstones)
    // equivalent single index: full build minus the same docs
    val full = Mutations.removeDocuments(
      IndexBuilder.build(src, "doc_id", Seq("content", "path")), removed)
    val f = results(QueryEngine.query(full, "import ident2", BM25()))
    val m = results(QueryEngine.query(merged, "import ident2", BM25()))
    assert(m == f && m.nonEmpty)
    assert(!m.exists { case (id, _) => removed.contains(id) })
  }

  test("merge refuses mismatched layouts") {
    import spark.implicits._
    val src = SourceCodeGen.generate(spark, 50)
    val one = IndexBuilder.build(src, "doc_id", Seq("content"))
    val two = IndexBuilder.build(src, "doc_id", Seq("content", "path"))
    intercept[IllegalArgumentException](InvertedIndex.merge(one, two))
  }

  // ---------------------------------------------------------- min-match

  test("minMatchFilter thresholds: m=1 == match set, m=n == conjunctive, m=2 == hand count") {
    // controlled corpus: slot terms "alpha beta gamma", docs with 1/2/3 hits
    val idx = buildTitleIndex(Seq(
      "alpha x y",            // 1 slot
      "beta gamma z",         // 2 slots
      "alpha beta gamma",     // 3 slots
      "gamma gamma gamma",    // 1 slot (distinct slots, not occurrences)
      "x y z")).cached()      // 0 slots
    val q = "alpha beta gamma"
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    assert(ids(QueryEngine.minMatchFilter(idx, q, 1)) == Set(0L, 1L, 2L, 3L))
    assert(ids(QueryEngine.minMatchFilter(idx, q, 2)) == Set(1L, 2L))
    assert(ids(QueryEngine.minMatchFilter(idx, q, 3)) == Set(2L))
    // clamped: 0 → 1, huge → n (== conjunctiveFilter)
    assert(ids(QueryEngine.minMatchFilter(idx, q, 0)) == Set(0L, 1L, 2L, 3L))
    assert(ids(QueryEngine.minMatchFilter(idx, q, 99)) ==
      ids(QueryEngine.conjunctiveFilter(idx, q)))
    idx.unpersist()
  }

  test("minMatch-filtered WAND == filtered exhaustive") {
    val src = SourceCodeGen.generate(spark, 800)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val blocks = PostingBlocks.fromPostings(idx.postings, 2, blockSize = 128).cache()
    val q = "import ident1 val"
    val allowed = QueryEngine.minMatchFilter(idx, q, 2)
    val exact = results(QueryEngine.query(idx, q, BM25(), limit = 10,
      docFilter = Some(allowed)))
    val wand = results(BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10,
      blockSize = 128, docFilter = Some(allowed)))
    assert(wand == exact && wand.nonEmpty)
    idx.unpersist(); blocks.unpersist()
  }

  // --------------------------------------------------------------- regex

  test("literalPrefix extraction") {
    assert(QueryEngine.literalPrefix("^spark$") == "spark")
    assert(QueryEngine.literalPrefix("^sp[a-z]+$") == "sp")
    assert(QueryEngine.literalPrefix("^spa*rk$") == "sp")   // quantified last char dropped
    assert(QueryEngine.literalPrefix("^s.*") == "s")
    assert(QueryEngine.literalPrefix("abc") == "")          // unanchored: no guarantee
    assert(QueryEngine.literalPrefix("^(a|b)c") == "")
    // TOP-LEVEL alternation: a later branch shares no prefix → ""
    assert(QueryEngine.literalPrefix("^row|raw$") == "")
    assert(QueryEngine.literalPrefix("^ab|^ac") == "")
    // …but an alternation NESTED after the prefix keeps it
    assert(QueryEngine.literalPrefix("^ab(c|d)e") == "ab")
    // '|' inside a character class is a literal, not an alternation
    assert(QueryEngine.literalPrefix("^ab[x|y]") == "ab")
    // escaped '|' is a literal too (prefix still stops at the backslash)
    assert(QueryEngine.literalPrefix("^ab\\|c") == "ab")
  }

  test("regexQuery == per-doc max over exact variant scores") {
    // vocab chosen so no matched term is a prefix of another dictionary
    // term: variants {row, raw} — docs score max(row-score, raw-score)
    val idx = buildTitleIndex(Seq(
      "row raw x",     // both variants
      "row y z",       // one
      "raw raw y",     // one, tf 2
      "x y z")).cached()
    val got = results(QueryEngine.regexQuery(idx, "^r[ao]w$", BM25()))
    // independent recomputation: exact single-term queries, per-doc max
    val byTerm = Seq("row", "raw").map(t =>
      results(QueryEngine.query(idx, t, BM25())).toMap)
    val expect = byTerm.flatMap(_.keys).distinct
      .map(id => (id, byTerm.flatMap(_.get(id)).max))
      .sortBy { case (id, s) => (-s, id) }
    assert(got == expect && got.nonEmpty)
    idx.unpersist()
  }

  test("regexQuery: collected path == over-cap fallback, incl. tombstones") {
    val src = SourceCodeGen.generate(spark, 500)
    val idx0 = IndexBuilder.build(src, "doc_id", Seq("content", "path"))
    val removed = src.select("doc_id").limit(5).collect().map(_.getLong(0)).toSeq
    for (idx <- Seq(idx0, Mutations.removeDocuments(idx0, removed))) {
      val p = "^ident[0-9]+$"
      val collected = results(QueryEngine.regexQuery(idx, p, BM25()))
      val fallback = results(QueryEngine.regexQuery(idx, p, BM25(),
        maxCollectedExpansions = 1))
      assert(collected == fallback && collected.nonEmpty)
      if (idx.hasTombstones)
        assert(!collected.exists { case (id, _) => removed.contains(id) })
    }
  }

  test("regexQuery: top-level alternation is full-string on EVERY branch") {
    // 'rows' starts with "row" and 'craw' ends with "raw" — a textually
    // anchored "^row|raw$" would match both as substrings; the grouped
    // anchor must match exactly {row, raw}
    val idx = buildTitleIndex(Seq(
      "row a", "raw b", "rows c", "craw d", "x y")).cached()
    val got = results(QueryEngine.regexQuery(idx, "row|raw", BM25()))
    // ^r[ao]w$ matches the identical term set {row, raw} with no
    // alternation — validated against per-doc max by the test above
    val expect = results(QueryEngine.regexQuery(idx, "^r[ao]w$", BM25()))
    assert(got == expect && got.size == 2)
    assert(got.map(_._1).toSet == Set(0L, 1L)) // 'rows'/'craw' excluded
    // collected path == over-cap fallback on the alternation too
    val fallback = results(QueryEngine.regexQuery(idx, "row|raw", BM25(),
      maxCollectedExpansions = 1))
    assert(got == fallback)
    idx.unpersist()
  }

  test("regexQuery: no dictionary match → empty result") {
    val idx = buildTitleIndex(Seq("a b c"))
    assert(QueryEngine.regexQuery(idx, "^zzz[0-9]$", BM25()).count() == 0)
  }
}
