package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Bench
import graft.index.IndexCatalog
import graft.query.{BlockMaxTopK, QueryEngine}
import graft.score.BM25

/** Phase-level latency decomposition of the block-max WAND path on the
  * minted 800k index, to locate where a non-pruning query's overhead goes:
  *
  *  - `exh`   = the exhaustive plan (the bail's tail);
  *  - `stats` = [[BlockMaxTopK.pruningStats]] = prepare (expansion resolve
  *              + block-metadata UB aggregation) + θ probe — the exact
  *              pre-tail overhead every WAND query pays;
  *  - `wand`  = the full [[BlockMaxTopK.query]];
  *  - `meta`  = a hand-built equivalent of prepare's metadata aggregation
  *              alone (no probe), isolating the block-metadata scan cost.
  *
  * All medians of `reps`, samples disclosed. Run AFTER the official bench
  * (reuses its /tmp tiered index).
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.WandPhaseProbe 800000 3"
  */
object WandPhaseProbe {
  def main(args: Array[String]): Unit = {
    val files = if (args.nonEmpty) args(0).toLong else 800000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = s"/tmp/graft_bench_tieridx_${Bench.CacheRecipe}_${files}_ord"
    val idx = IndexCatalog.read(spark, root)
    IndexCatalog.buildBlocks(spark, root)
    val (blocks, bs, rpg) = IndexCatalog.readBlocks(spark, root)
    idx.termdict.cache().count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def js(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString("[", ",", "]")

    for (q <- Bench.QuerySet) {
      // warm all plans once
      QueryEngine.query(idx, q, BM25(), limit = 10).collect()
      BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10, blockSize = bs,
        rangesPerGroup = rpg).collect()
      BlockMaxTopK.pruningStats(idx, blocks, q, BM25(), k = 10,
        blockSize = bs, rangesPerGroup = rpg)

      val exh = (1 to reps).map(_ => time(
        QueryEngine.query(idx, q, BM25(), limit = 10).collect()))
      val stats = (1 to reps).map(_ => time(
        BlockMaxTopK.pruningStats(idx, blocks, q, BM25(), k = 10,
          blockSize = bs, rangesPerGroup = rpg)))
      val wand = (1 to reps).map(_ => time(
        BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10, blockSize = bs,
          rangesPerGroup = rpg).collect()))
      // metadata aggregation alone: same shape as prepare's UB table
      // (filter + narrow select + groupBy), without expansion UB factors
      val eterms = QueryEngine.expandTerm(idx, q.split(" ").head)
        .collect().map(_.getString(0)).toSeq
      val meta = (1 to reps).map(_ => time {
        blocks.toDF().filter(col("term").isin(eterms: _*))
          .select(col("term"), col("block_id"), col("max_tf"), col("cnt"))
          .groupBy(col("block_id")).agg(max(col("max_tf")), max(col("cnt")))
          .collect()
        ()
      })
      println(f"""{"probe":"wand_phase","q":"$q","exh_p50":${med(exh)}%.2f,"exh":${js(exh)},""" +
        f""""prep_probe_p50":${med(stats)}%.2f,"prep_probe":${js(stats)},""" +
        f""""wand_p50":${med(wand)}%.2f,"wand":${js(wand)},""" +
        f""""meta_agg_p50":${med(meta)}%.2f,"meta_agg":${js(meta)},"terms":${eterms.size}}""")
    }
    spark.stop()
  }
}
