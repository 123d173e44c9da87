package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Bench
import graft.index.IndexCatalog

/** Cost-shape evidence for the delta-dictionary append (round-4 verdict
  * #3): the per-batch stage cost of `addDocuments` must be independent of
  * corpus vocabulary/size. Each corpus gets 32 per-doc UNIQUE tokens
  * appended so the dictionary genuinely scales with n — 32n + ~500 terms;
  * the stock generator's fixed ~500-term vocab would let the ~3 s fixed
  * job overhead mask the cost shape entirely. A FIXED 500-doc delta is
  * then appended 3× on the delta path (the default) and 3× with
  * `compactDeltasEvery = 1`, which forces the pre-round-5 full
  * dictionary+stats merge per batch. Expected: delta seconds ~flat in n,
  * rollup seconds growing with n (it rewrites the O(n)-row dictionary and
  * re-aggregates the O(n)-row docstats per batch). One untimed warmup
  * append absorbs the JIT/codegen cost; all samples disclosed (this VM
  * swings 5× on host steal).
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.AppendCostProbe 50000 200000 800000"
  */
object AppendCostProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(50000L, 200000L, 800000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 32 tokens unique to each doc: vocabulary scales 32x with corpus size
    def uniqify(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("content", concat(col("content"), lit(" "),
        array_join(transform(sequence(lit(0), lit(31)),
          j => concat(lit("uq"), col("doc_id").cast("string"), lit("x"),
            j.cast("string"))), " ")))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def js(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString("[", ",", "]")

    for (n <- sizes) {
      val root = s"/tmp/graft_appendcost_$n"
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      val src = uniqify(spark.read.parquet(Bench.corpusTable(spark, n)))
      IndexCatalog.build(src, "doc_id", Seq("content", "path"), root)
      val vocab = IndexCatalog.read(spark, root).termdict.count()

      def delta(tag: Long) = uniqify(
        SourceCodeGen.generate(spark, 500, seed = 7L + tag)
          .withColumn("doc_id", col("doc_id") + n * 10 + tag * 1000))

      IndexCatalog.addDocuments(delta(20), "doc_id", root) // untimed warmup
      val dts = (0 to 2).map(i =>
        time(IndexCatalog.addDocuments(delta(i), "doc_id", root)))
      val rts = (3 to 5).map(i =>
        time(IndexCatalog.addDocuments(delta(i), "doc_id", root,
          compactDeltasEvery = 1)))
      println(f"""{"probe":"append_cost","files":$n,"vocab":$vocab,""" +
        f""""delta_append_p50_secs":${med(dts)}%.2f,"delta_samples":${js(dts)},""" +
        f""""rollup_append_p50_secs":${med(rts)}%.2f,"rollup_samples":${js(rts)},"cores":"$cores"}""")
    }
    spark.stop()
  }
}
