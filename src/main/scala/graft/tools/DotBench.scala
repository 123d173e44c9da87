package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Micro-benchmark: fused native dot product (DotProductFF) vs the
  * composed `aggregate(zip_with(...))` form, over n synthetic 64-dim
  * float vectors. Usage: runMain graft.tools.DotBench [n] [reps]
  */
object DotBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = spark.range(n).select(col("id"),
      transform(sequence(lit(1), lit(64)),
        i => pmod(xxhash64(col("id"), i), lit(1000)).cast("float") / lit(1000f))
        .cast("array<float>").as("v"))
      .cache()
    vecs.count()
    def time(label: String, c: org.apache.spark.sql.Column): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        vecs.select(sum(c)).head()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = ts(ts.size / 2)
      println(f"$label%-10s median $med%.2f s  samples ${ts.map(t => f"$t%.2f").mkString(" ")}")
      med
    }
    val f = time("fused", Similarity.dot(col("v"), col("v")))
    val c = time("composed", Similarity.dotComposed(col("v"), col("v")))
    println(f"""{"probe":"dot","n":$n,"fused_secs":$f%.3f,"composed_secs":$c%.3f,"speedup":${c / f}%.2f}""")
    val bf = time("lsh-fused", Similarity.signLshBucket(col("v"), 64, 8).cast("long"))
    val bc = time("lsh-comp", Similarity.signLshBucketComposed(col("v"), 64, 8).cast("long"))
    println(f"""{"probe":"signlsh","n":$n,"fused_secs":$bf%.3f,"composed_secs":$bc%.3f,"speedup":${bc / bf}%.2f}""")
    spark.stop()
  }
}
