package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexCatalog, InvertedIndex}
import graft.query.QueryEngine
import graft.score.BM25

/** One-shot plan audit for the round-5 result-page operators over the
  * PERSISTED index (the deployment shape): prints the physical plans so
  * scan pruning / join strategies / exchange counts can be eyeballed and
  * recorded in BENCH.md.
  */
object R5PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    // root keyed by the data dir: a fixed path would silently reuse an
    // index built from a DIFFERENT corpus on re-runs with another arg
    val root = "/tmp/graft_audit_idx_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(new org.apache.hadoop.fs.Path(s"$root/manifest.json")))
      IndexCatalog.build(docs, "doc_id", Seq("text"), root)
    val idx = IndexCatalog.read(spark, root)

    println("=== batchQuery (3 queries, k=10) ===")
    QueryEngine.batchQuery(idx, Seq(1L -> "spar merge", 2L -> "table",
      3L -> "slow key window"), BM25(), k = 10).explain("formatted")

    println("=== phraseFilter('merge group') ===")
    QueryEngine.phraseFilter(idx, docs, "doc_id", Seq("text"), "merge group")
      .explain("formatted")

    println("=== facetCounts(source, 'spar merge') ===")
    QueryEngine.facetCounts(idx, docs, "doc_id", "source", "spar merge")
      .explain("formatted")

    println("=== explain('spar merge', k=20) ===")
    QueryEngine.explain(idx, "spar merge", BM25(), k = 20)
      .explain("formatted")

    println("=== searchAfter('spar merge', page 2) ===")
    QueryEngine.searchAfter(idx, "spar merge", BM25(),
      afterScoreMicro = 1000000L, afterDocId = 0L, k = 20)
      .explain("formatted")

    println("=== synonymQuery('spar merge', merge->join) ===")
    QueryEngine.synonymQuery(idx, "spar merge",
      Map("merge" -> Seq("join")), BM25()).explain("formatted")

    println("=== NOT: query with exclusionFilter('window') ===")
    QueryEngine.query(idx, "spar merge", BM25(), limit = 20,
      docFilter = Some(QueryEngine.exclusionFilter(idx, "spar merge", "window")))
      .explain("formatted")

    println("=== minMatch (2 of 3): query with minMatchFilter ===")
    QueryEngine.query(idx, "spar merge slow", BM25(), limit = 20,
      docFilter = Some(QueryEngine.minMatchFilter(idx, "spar merge slow", 2)))
      .explain("formatted")

    println("=== regexQuery('^s[a-z]+a[a-z]+$') ===")
    QueryEngine.regexQuery(idx, "^s[a-z]+a[a-z]+$", BM25(), limit = 20)
      .explain("formatted")

    println("=== shard-merged index: query('window key') ===")
    val sa = IndexBuilder.build(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", Seq("text"))
    val sb = IndexBuilder.build(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", Seq("text"))
    QueryEngine.query(InvertedIndex.merge(sa, sb), "window key", BM25(),
      limit = 20).explain("formatted")

    println("=== rrf(bm25 top-100, vector top-100) ===")
    val micro = (c: org.apache.spark.sql.Column) =>
      round(c * 1000000.0).cast("long")
    val lex = QueryEngine.query(idx, "spar merge", BM25())
      .select(col("doc_id"), micro(col("score")).as("m"))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val vec = emb.select(col("vec_id").as("doc_id"),
      micro(graft.pipeline.Similarity.cosine(col("embedding"),
        array(qv.map(v => lit(v)): _*))).as("m"))
    graft.query.Fusion.rrf(Seq(lex, vec), "doc_id", "m", topK = 20)
      .explain("formatted")

    println("=== collapseTop(bm25 matches, by source) ===")
    graft.query.Fusion.collapseTop(
      QueryEngine.query(idx, "spar merge", BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro")),
      docs, "doc_id", "source", "score_micro").explain("formatted")

    println("=== rescore(bm25 window=50, cosine, 1:2) ===")
    graft.query.Fusion.rescore(lex, "doc_id", "m", vec, "m",
      windowSize = 50, rescoreWeight = lit(2L), topK = 20)
      .explain("formatted")

    println("=== functionScore(bm25 x length decay) ===")
    graft.query.Fusion.functionScore(
      QueryEngine.query(idx, "spar merge", BM25()), docs, "doc_id",
      Seq("n_chars"), "score",
      lit(1000.0) / (lit(1000L) + col("n_chars"))).explain("formatted")

    println("=== phraseFilter('merge group', slop=2) ===")
    QueryEngine.phraseFilter(idx, docs, "doc_id", Seq("text"),
      "merge group", slop = 2).explain("formatted")

    println("=== boolQuery(must=merge, should=spark table, mustNot=window) ===")
    QueryEngine.boolQuery(idx, BM25(), must = "merge",
      should = "spark table", mustNot = "window", limit = 20)
      .explain("formatted")

    println("=== histogram(length(text)/64, 'merge spar') ===")
    QueryEngine.histogram(idx, docs, "doc_id", length(col("text")), 64.0,
      "merge spar").explain("formatted")

    println("=== termVectors(3, 7, 11) ===")
    QueryEngine.termVectors(idx, Seq(3L, 7L, 11L)).explain("formatted")

    println("=== significantTerms('spar merge', top 15) ===")
    QueryEngine.significantTerms(idx, "spar merge", topN = 15,
      minDocCount = 3L).explain("formatted")

    println("=== dfsTopK(3 shards, 'spar merge', k=20) ===")
    val s3 = Seq(0, 1, 2).map(r =>
      IndexBuilder.build(docs.filter(col("doc_id") % 3 === r), "doc_id",
        Seq("text")))
    graft.query.ShardedSearch.dfsTopK(s3, "spar merge", BM25(), k = 20)
      .explain("formatted")
    spark.stop()
  }
}
