package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Growth-slope probe for the two near-dup Jaccard paths over distinct
  * synthetic docs with a skewed shared vocabulary (SourceCodeGen):
  * `jaccardPairs` (exact shared-shingle candidates, hot buckets capped)
  * vs `jaccardPairsViaLsh` (MinHash-LSH candidates, exact Jaccard on
  * candidates only). Usage:
  *   runMain graft.tools.DedupScaleProbe 5000 10000 20000
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(5000L, 10000L, 20000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- sizes) {
      val docs = SourceCodeGen.generate(spark, n)
        .select(col("doc_id"), col("content").as("text")).cache()
      docs.count()
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tExact, rExact) = time(
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.02).count())
      spark.catalog.clearCache(); docs.cache().count()
      val (tLsh, rLsh) = time(
        Dedup.jaccardPairsViaLsh(docs, "doc_id", "text", 3, 8, 2, 0.02).count())
      spark.catalog.clearCache()
      println(s"""{"probe":"dedup_scale","n":$n,"exact_secs":$tExact,"exact_pairs":$rExact,"lsh_secs":$tLsh,"lsh_pairs":$rLsh}""")
    }
    spark.stop()
  }
}
