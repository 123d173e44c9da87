package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Bench
import graft.index.IndexBuilder
import graft.query.{QueryEngine, ShardedSearch}
import graft.score.BM25

/** Serving-cost probe for DFS scatter-gather ([[ShardedSearch.dfsTopK]]):
  * at a bench-scale corpus, how much does answering through S held shards
  * cost over the single held index? Both sides cached (the deployment
  * holds its indexes; the q84 gate deliberately rebuilds per rep, which
  * dominates its contract number), global dict/stats folded ONCE outside
  * the timed loop (a deployment refreshes them per index generation, not
  * per query). Reports p50 of `reps` per query for single vs dfs.
  *
  * Usage: runMain graft.tools.DfsProbe [files] [shards] [reps]
  */
object DfsProbe {
  def main(args: Array[String]): Unit = {
    val files = if (args.nonEmpty) args(0).toLong else 400000L
    val nShards = if (args.length > 1) args(1).toInt else 4
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = spark.read.parquet(Bench.corpusTable(spark, files)).cache()
    src.count()

    val full = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    full.postings.count()
    val shards = (0 until nShards).map(r =>
      IndexBuilder.build(src.filter(col("doc_id") % nShards === r),
        "doc_id", Seq("content", "path")).cached())
    shards.foreach(_.postings.count())

    def p50(samples: Seq[Double]): Double = samples.sorted.apply(samples.size / 2)
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // deployment shape: globals folded once per generation, dictionary
    // cached, then many gather calls
    val prepared = ShardedSearch.prepareShards(shards)
    prepared.head.termdict.cache().count()
    val queries = Seq("import", "pkg ident1", "fn match ident1", "ide")
    val out = queries.map { q =>
      val single = (1 to reps).map(_ =>
        time(QueryEngine.query(full, q, BM25(), limit = 10).count()))
      val dfs = (1 to reps).map(_ =>
        time(ShardedSearch.gatherTopK(prepared, q, BM25(), k = 10).count()))
      f""""$q":{"single_p50":${p50(single)}%.3f,"dfs_p50":${p50(dfs)}%.3f}"""
    }
    println(s"""{"files":$files,"shards":$nShards,"reps":$reps,${out.mkString(",")}}""")
    spark.stop()
  }
}
