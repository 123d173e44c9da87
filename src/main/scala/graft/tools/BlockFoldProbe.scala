package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Bench
import graft.index.IndexCatalog

/** O(delta) evidence for incremental block maintenance (round-4 verdict
  * #1): time the FULL block build over an n-file index vs the `buildBlocks`
  * FOLD after a fixed 1000-doc append (fresh doc-ids ⇒ fresh rg partitions
  * plus at most one boundary per bucket). The round-4 engine paid the
  * full-build cost on every mutation; the fold must cost a small constant
  * regardless of n.
  *
  * Methodology (this VM swings 5× on host steal, and the first Spark jobs
  * in a JVM pay all the codegen/JIT): one UNTIMED full build + fold warm
  * the paths, then medians — full builds ×2 (via [[IndexCatalog.dropBlocks]]
  * between them), folds ×3 each with a fresh delta — with all samples
  * disclosed.
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.BlockFoldProbe 200000 800000"
  */
object BlockFoldProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(200000L, 800000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def js(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString("[", ",", "]")

    for (n <- sizes) {
      val root = s"/tmp/graft_blockfold_$n"
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      IndexCatalog.build(spark.read.parquet(Bench.corpusTable(spark, n)),
        "doc_id", Seq("content", "path"), root)
      def delta(tag: Long) = SourceCodeGen.generate(spark, 1000, seed = 9L + tag)
        .withColumn("doc_id", col("doc_id") + n * 10 + tag * 10000)
      // warmup: one full build + one fold, untimed (JIT/codegen)
      IndexCatalog.buildBlocks(spark, root)
      IndexCatalog.addDocuments(delta(9), "doc_id", root)
      IndexCatalog.buildBlocks(spark, root)
      val fulls = (1 to 2).map { _ =>
        IndexCatalog.dropBlocks(spark, root)
        time(IndexCatalog.buildBlocks(spark, root))
      }
      val folds = (0 to 2).map { t =>
        IndexCatalog.addDocuments(delta(t), "doc_id", root)
        time(IndexCatalog.buildBlocks(spark, root))
      }
      val rows = IndexCatalog.readBlocks(spark, root)._1.count()
      println(f"""{"probe":"block_fold","files":$n,"full_build_p50_secs":${med(fulls)}%.2f,""" +
        f""""full_samples":${js(fulls)},"fold_p50_secs":${med(folds)}%.2f,""" +
        f""""fold_samples":${js(folds)},"ratio":${med(fulls) / math.max(med(folds), 1e-9)}%.1f,""" +
        f""""block_rows":$rows,"cores":"$cores"}""")
    }
    spark.stop()
  }
}
