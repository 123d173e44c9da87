package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone runner for the bench's `bm25_topk_p50` / `wand_topk_p50`
  * metrics (reuses [[graft.Bench.runQueries]]/`runWandQueries` and the
  * persisted bench index) — so a WAND-path change can be measured without
  * paying the whole official bench.
  *
  *   sbt "runMain graft.tools.WandP50Probe 200000"
  */
object WandP50Probe {
  def main(args: Array[String]): Unit = {
    val files = if (args.nonEmpty) args(0).toLong else 200000L
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p50 = graft.Bench.runQueries(spark, files)
    val wand = graft.Bench.runWandQueries(spark, files)
    println(f"""{"bm25_topk_p50":$p50%.3f,"wand_topk_p50":$wand%.3f}""")
    spark.stop()
  }
}
