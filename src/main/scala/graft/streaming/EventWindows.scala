package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation over the `events` stream: 5-minute
  * tumbling windows per event_type with a 10-minute watermark — the
  * standard late-data-tolerant streaming shape (readStream → watermark →
  * window → agg). [[runAvailableNow]] drives the same plan over a bounded
  * source to completion, so the result is deterministic and
  * batch-comparable (the driver oracle runs the equivalent GROUP BY in
  * DuckDB).
  */
object EventWindows {

  /** The windowed aggregation, identical for batch and streaming inputs:
    * (window_start, event_type, n, sum_value).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      // watermarks require instant-semantics TimestampType; parquet NTZ
      // columns cast 1:1 under the UTC session timezone
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")) * lit(1e2)).cast("long").as("sum_value_c"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value_c"))

  /** Stage a single-file source into a directory (the file source wants a
    * DIRECTORY); returns `eventsParquet` unchanged when already a dir.
    */
  private def stageSource(eventsParquet: String): String = {
    // stage a copy into a tmp dir keyed by (path, length, mtime): a
    // regenerated file at the same path gets a fresh staging dir instead
    // of silently reusing stale bytes, and the full key in the dir name
    // cannot collide the way a bare hashCode could
    val p = java.nio.file.Paths.get(eventsParquet)
    if (java.nio.file.Files.isDirectory(p)) eventsParquet
    else {
      val sz = java.nio.file.Files.size(p)
      val mt = java.nio.file.Files.getLastModifiedTime(p).toMillis
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$eventsParquet|$sz|$mt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val d = java.nio.file.Paths.get(s"/tmp/graft_stream_src_$key")
      java.nio.file.Files.createDirectories(d)
      val dst = d.resolve(p.getFileName)
      java.nio.file.Files.copy(p, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      d.toString
    }
  }

  private def freshCkpt(checkpoint: String): String =
    // a REUSED checkpoint would see no new data on rerun and emit nothing;
    // these entry points are bounded, rerunnable computations, so default
    // to a fresh checkpoint per invocation
    if (checkpoint.nonEmpty) checkpoint
    else java.nio.file.Files.createTempDirectory("graft_ew_ckpt_").toString

  /** Run the aggregation as a REAL streaming query (file source, exactly
    * the plan a 24/7 deployment would run) over the bounded events dir,
    * AvailableNow-triggered, results collected from a memory sink.
    *
    * ORACLE-HARNESS shape: `complete` mode re-emits the full state each
    * trigger and the memory sink accumulates on the driver — deterministic
    * and batch-comparable, but driver-bounded. The deployment shape is
    * [[runAppendToDir]].
    */
  /** Streaming state partition count: stateful operators shuffle into
    * `spark.sql.shuffle.partitions` state-store instances, each paying
    * per-batch checkpoint I/O — this is a STATE-SIZING knob, not a
    * parallelism knob, and the session default (sized for batch shuffles)
    * oversizes it badly for window-count-bounded state. Streaming entry
    * points run on a cloned session pinned to this value so deployments
    * size it to their window cardinality, independent of batch tuning.
    */
  val DefaultStatePartitions = 8

  private def streamSession(spark: SparkSession, statePartitions: Int): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions)
    ss
  }

  /** NOTE: the returned DataFrame is the ONLY handle on the result. The
    * memory sink's temp view lives on an internal cloned session (so the
    * state-partition override cannot leak into the caller's conf), and is
    * NOT visible via `spark.table(...)` on the caller's session.
    */
  def runAvailableNow(spark: SparkSession, eventsParquet: String,
      checkpoint: String = "",
      statePartitions: Int = DefaultStatePartitions): DataFrame = {
    val ss = streamSession(spark, statePartitions)
    val src = stageSource(eventsParquet)
    val schema = ss.read.parquet(src).schema
    val stream = ss.readStream.schema(schema).parquet(src)
    val name = "graft_event_windows_" + math.abs(eventsParquet.hashCode)
    val q = windowedCounts(stream).writeStream
      .outputMode("complete")
      .format("memory").queryName(name)
      .option("checkpointLocation", freshCkpt(checkpoint))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    ss.table(name)
  }

  /** DEPLOYMENT shape: `append`-mode parquet file sink. Only windows the
    * watermark has closed are emitted (each exactly once), streaming state
    * is bounded by the watermark horizon, and output scales with the sink,
    * not driver memory. Over a bounded source the trailing windows the
    * watermark never passes are deliberately withheld — that is append
    * semantics; EventWindowsSpec pins append-output == complete-output
    * restricted to closed windows.
    */
  def runAppendToDir(spark: SparkSession, eventsParquet: String,
      outDir: String, checkpoint: String = "",
      statePartitions: Int = DefaultStatePartitions): DataFrame = {
    val ss = streamSession(spark, statePartitions)
    val src = stageSource(eventsParquet)
    val schema = ss.read.parquet(src).schema
    val stream = ss.readStream.schema(schema).parquet(src)
    val agg = windowedCounts(stream)
    val q = agg.writeStream
      .outputMode("append")
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", freshCkpt(checkpoint))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    // explicit schema: when the source's time span never advances the
    // watermark past a window, the sink holds zero data files and schema
    // inference would throw instead of returning an empty result
    spark.read.schema(agg.schema).parquet(outDir)
  }
}
