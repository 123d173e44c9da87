package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, Mutations}
import graft.query.QueryEngine
import graft.score.{BM25, ZeroToOne}

/** End-to-end example driving the public API against the driver testdata:
  * build an index over `documents.parquet`, query it with both scorers,
  * expand a prefix, tombstone some docs, vacuum, re-query.
  *
  *   sbt "runMain graft.tools.Demo /root/testdata/sf0.001 'spark merge'"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val q = if (args.length > 1) args(1) else "spark merge"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"== corpus: ${docs.count()} docs from $dir")

    val idx = IndexBuilder.build(docs, "doc_id", Seq("text")).cached()
    val stats = idx.fieldStats()
    println(s"== index: ${idx.termdict.count()} distinct terms, " +
      s"${idx.postings.count()} postings, N=${stats.n}, avgLen=${stats.avgs.head}")

    println(s"== BM25 '$q' top 5:")
    QueryEngine.query(idx, q, BM25(), limit = 5).show(false)

    println(s"== zero-to-one '$q' top 5:")
    QueryEngine.query(idx, q, ZeroToOne(), limit = 5).show(false)

    println("== expand 'spa':")
    QueryEngine.expandTerm(idx, "spa").show(false)

    println("== remove docs 0..9, re-query (tombstoned):")
    val removed = Mutations.removeDocuments(idx, (0L until 10L))
    QueryEngine.query(removed, q, BM25(), limit = 5).show(false)

    println("== vacuum, re-query:")
    val vacuumed = Mutations.vacuum(removed)
    QueryEngine.query(vacuumed, q, BM25(), limit = 5).show(false)

    println("== persisted catalog + block-max WAND:")
    val root = java.nio.file.Files.createTempDirectory("graft_demo_idx_").toString
    graft.index.IndexCatalog.build(docs, "doc_id", Seq("text"), root, nBuckets = 16)
    graft.index.IndexCatalog.buildBlocks(spark, root, blockSize = 512)
    val pidx = graft.index.IndexCatalog.read(spark, root)
    val (blocks, bs, rpg) = graft.index.IndexCatalog.readBlocks(spark, root)
    graft.query.BlockMaxTopK.query(pidx, blocks, q, BM25(), k = 5,
      blockSize = bs, rangesPerGroup = rpg).show(false)

    println("== streaming windowed aggregation over events (AvailableNow):")
    graft.streaming.EventWindows.runAvailableNow(spark, s"$dir/events.parquet")
      .orderBy("window_start", "event_type").show(5, false)

    println("== physical plan of the BM25 query:")
    QueryEngine.query(idx, q, BM25(), limit = 5).explain("formatted")

    spark.stop()
  }
}
