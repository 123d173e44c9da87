package graft

import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.IndexBuilder
import graft.query.QueryEngine
import graft.score.BM25

/** Facet counts and more-like-this: ground truth recomputed driver-side
  * from the raw corpus, never from the engine.
  */
class MltFacetSpec extends TestBase {

  test("facetCounts == driver replay of (match set × facet histogram)") {
    val src = tools.SourceCodeGen.generate(spark, 800).cache()
    val idx = IndexBuilder.build(src, "doc_id", Seq("content")).cached()
    val q = Seq("import", "Modu")
    val rows = src.select(col("doc_id"), col("content"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = rows
      .filter { case (_, text, _) =>
        Analyzer.tokenize(text).exists(t => q.exists(t.startsWith)) }
      .groupBy(_._3).map { case (lang, ds) => (lang, ds.length.toLong) }
    val got = QueryEngine.facetCounts(idx, src, "doc_id", "lang",
      q.mkString(" ")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toMap == want && got.nonEmpty)
    // ordered (n_docs desc, facet asc)
    assert(got.toSeq == got.toSeq.sortBy { case (f, n) => (-n, f) })
    idx.unpersist(); src.unpersist()
  }

  test("matchedDocs == the scored query's doc set (both resolution tiers)") {
    val src = tools.SourceCodeGen.generate(spark, 600)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content")).cached()
    val scoredSet = QueryEngine.query(idx, "import Modu", BM25())
      .collect().map(_.getLong(0)).toSet
    val m1 = QueryEngine.matchedDocs(idx, "import Modu")
      .collect().map(_.getLong(0)).toSet
    val m2 = QueryEngine.matchedDocs(idx, "import Modu",
      maxCollectedExpansions = 1).collect().map(_.getLong(0)).toSet
    assert(m1 == scoredSet && m2 == scoredSet && m1.nonEmpty)
    assert(QueryEngine.matchedDocs(idx, "zzznope").isEmpty)
    idx.unpersist()
  }

  test("moreLikeThis == query(top tf-idf terms) minus the seed") {
    val src = tools.SourceCodeGen.generate(spark, 700).cache()
    val idx = IndexBuilder.build(src, "doc_id", Seq("content")).cached()
    val seed = 5L
    // ground-truth salience from the raw corpus
    val toks = src.select(col("doc_id"), col("content")).collect()
      .map(r => (r.getLong(0), Analyzer.tokenize(r.getString(1))))
    val n = toks.length.toDouble
    val df = toks.flatMap(_._2).groupBy(identity)
      .map { case (t, os) => t -> os.length.toLong }
    val occ = toks.find(_._1 == seed).get._2.groupBy(identity)
      .map { case (t, os) => t -> os.length.toLong }
    val top = occ.toSeq.map { case (t, o) =>
        val f = math.min(n, df(t).toDouble)
        (t, o.toDouble * math.log(1.0 + (n - f + 0.5) / (f + 0.5)))
      }.sortBy { case (t, w) => (-w, t) }.take(5).map(_._1)
    val want = QueryEngine.query(idx, top.mkString(" "), BM25()).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).filter(_._1 != seed).toSeq
    val got = QueryEngine.moreLikeThis(idx, seed, BM25()).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want && got.nonEmpty)
    assert(!got.exists(_._1 == seed))
    // the seed doc itself must rank FIRST for its own terms pre-exclusion
    // (sanity that the salience terms really are the doc's)
    val withSeed = QueryEngine.query(idx, top.mkString(" "), BM25()).collect()
    assert(withSeed.nonEmpty)
    // limit honored after exclusion
    assert(QueryEngine.moreLikeThis(idx, seed, BM25(), limit = 3)
      .collect().length == 3)
    idx.unpersist(); src.unpersist()
  }

  test("moreLikeThis on a missing doc id is empty") {
    val src = tools.SourceCodeGen.generate(spark, 100)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content"))
    assert(QueryEngine.moreLikeThis(idx, 999999L, BM25()).isEmpty)
  }
}
