package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Bench
import graft.index.IndexCatalog

/** Cost-shape evidence for the persisted shard merge
  * ([[IndexCatalog.mergeShards]]): the merge must cost O(#files) copies
  * plus the vocab-sized dictionary aggregate — NEVER a corpus re-tokenize.
  * For each corpus size n the probe builds two parity shards (untimed —
  * the deployment builds them in parallel on separate clusters), then
  * times (a) the merge of the two roots and (b) the equivalent
  * single-shot full build. Expected: merge seconds a small fraction of
  * build seconds, with the gap WIDENING as n grows (the build is
  * O(corpus tokens), the merge's only scaling terms are file count and
  * vocabulary); the manifest's stage timings split the merge into its
  * dictionary/stats compute vs the file-copy remainder.
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.MergeCostProbe 100000 400000"
  */
object MergeCostProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(100000L, 400000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def wipe(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      ()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def js(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString("[", ",", "]")

    for (n <- sizes) {
      val src = spark.read.parquet(Bench.corpusTable(spark, n))
      val (a, b) = (s"/tmp/graft_mergecost_a_$n", s"/tmp/graft_mergecost_b_$n")
      Seq(a, b).foreach(wipe)
      IndexCatalog.build(src.filter(col("doc_id") % 2 === 0),
        "doc_id", Seq("content", "path"), a)
      IndexCatalog.build(src.filter(col("doc_id") % 2 === 1),
        "doc_id", Seq("content", "path"), b)

      // merge (median of 3, fresh out root each rep) vs one full build —
      // the full build is a single sample: it IS the dominant cost and
      // its absolute scale is already medianed in the closing bench
      val mts = (0 to 2).map { i =>
        val out = s"/tmp/graft_mergecost_m_${n}_$i"
        wipe(out)
        time(IndexCatalog.mergeShards(spark, Seq(a, b), out))
      }
      val mm = IndexCatalog.manifest(spark, s"/tmp/graft_mergecost_m_${n}_0")
      val dictSecs = mm.getOrElse("stage.termdict.secs", "-1").toDouble +
        mm.getOrElse("stage.fieldstats.secs", "-1").toDouble
      val full = s"/tmp/graft_mergecost_f_$n"
      wipe(full)
      val bt = time(IndexCatalog.build(src, "doc_id", Seq("content", "path"), full))
      println(f"""{"probe":"merge_cost","files":$n,""" +
        f""""merge_p50_secs":${med(mts)}%.2f,"merge_samples":${js(mts)},""" +
        f""""merge_dict_stage_secs":$dictSecs%.2f,""" +
        f""""full_build_secs":$bt%.2f,"cores":"$cores"}""")
      (0 to 2).foreach(i => wipe(s"/tmp/graft_mergecost_m_${n}_$i"))
      Seq(a, b, full).foreach(wipe)
    }
    spark.stop()
  }
}
