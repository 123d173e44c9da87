package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Bench
import graft.index.IndexCatalog

/** O(delta) evidence for incremental block maintenance (round-4 verdict
  * #1): time the FULL block build over an n-file index, append a fixed
  * 1000-doc delta (fresh doc-ids ⇒ fresh rg partitions plus at most one
  * boundary), and time the `buildBlocks` FOLD. The round-4 engine paid the
  * full-build cost again on every mutation; the fold must cost a small
  * constant regardless of n.
  *
  *   sbt "runMain graft.tools.BlockFoldProbe 200000 800000"
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
    for (n <- sizes) {
      val root = s"/tmp/graft_blockfold_$n"
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      IndexCatalog.build(spark.read.parquet(Bench.corpusTable(spark, n)),
        "doc_id", Seq("content", "path"), root)
      val fullSecs = time(IndexCatalog.buildBlocks(spark, root))
      val delta = SourceCodeGen.generate(spark, 1000, seed = 9L)
        .withColumn("doc_id", col("doc_id") + n * 10)
      IndexCatalog.addDocuments(delta, "doc_id", root)
      val foldSecs = time(IndexCatalog.buildBlocks(spark, root))
      val rows = IndexCatalog.readBlocks(spark, root)._1.count()
      println(f"""{"probe":"block_fold","files":$n,"full_build_secs":$fullSecs%.2f,""" +
        f""""fold_secs":$foldSecs%.2f,"ratio":${fullSecs / math.max(foldSecs, 1e-9)}%.1f,""" +
        f""""block_rows":$rows,"cores":"$cores"}""")
    }
    spark.stop()
  }
}
