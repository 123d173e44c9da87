package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone runner for [[graft.Bench.runWandMinted]] — the tiered-corpus
  * impact-ordered-minting experiment — so the recipe can be iterated on
  * without paying the whole official bench.
  *
  *   sbt "runMain graft.tools.MintedProbe 400000 3"
  */
object MintedProbe {
  def main(args: Array[String]): Unit = {
    val files = if (args.nonEmpty) args(0).toLong else 400000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.Bench.runWandMinted(spark, files, reps))
    spark.stop()
  }
}
