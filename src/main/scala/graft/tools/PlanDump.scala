package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump `.explain("formatted")` of contract queries to files — the
  * before/after plan evidence the optimization rounds commit under
  * `plans/rNN/`. Usage:
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [query ...]
  * (no query names = all). Each query's DataFrame is built (driver caches
  * warm up exactly as in the bench) and its formatted plan written to
  * `<outDir>/<query>_<suffix>.txt`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
        println(s"dumped $n")
      } catch {
        case e: Throwable => println(s"FAILED $n: ${e.getMessage}")
      } finally graft.pipeline.CacheScope.releaseGlobal()
    }
    spark.stop()
  }
}
