package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-contract-query repeated timing at a testdata dir — separates
  * host-contention noise and one-time cache builds from steady-state cost.
  * Usage: runMain graft.tools.ContractProfile <sfDir> <reps> [q14_jaccard ...]
  *
  * NOTE: unlike the official bench, this does NOT flush the global
  * CacheScope between reps — pipeline queries whose per-query persists
  * are plan-identical across reps then reuse the CacheManager entry, so
  * their warm numbers here are FLATTERED vs graft.Bench (which releases
  * per rep). Use graft.tools.JobProfile (release per rep) or the bench
  * itself for honest pipeline-query numbers.
  */
object ContractProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names; fn = SparkEntry.queries(n)) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-20s " + times.map(t => f"$t%7.2f").mkString(" "))
    }
    spark.stop()
  }
}
