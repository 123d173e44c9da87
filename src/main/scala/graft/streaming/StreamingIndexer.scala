package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.IndexCatalog

/** Structured-Streaming ingestion into a persisted index: each micro-batch
  * of new documents becomes one incremental [[IndexCatalog.addDocuments]]
  * delta (O(batch) work — the Spark analog of the reference's
  * insertion-optimized `add_document` loop).
  *
  * EXACTLY-ONCE batches, not just checkpoint-once delivery: foreachBatch
  * replays a micro-batch when the job dies between the append's publish
  * and the streaming checkpoint commit — a plain `addDocuments` per batch
  * would then index the same documents twice (duplicate postings, wrong
  * document frequencies, silently shifted BM25 scores). The batch id rides
  * the index's own manifest instead (the [[StreamingVectorIndexer]]
  * protocol): STAGE commits `stream.stagedBatch = id` atomically with
  * `append.staged`, PUBLISH promotes it to `stream.lastBatch` in the
  * commit write, a replayed batch with `id <= stream.lastBatch` is a
  * no-op, and one matching `stream.stagedBatch` resumes the publish
  * instead of re-staging.
  *
  * The reference has no streaming at all; this is the north-star "keep the
  * index fresh" deployment shape: readStream (files/Kafka/...) →
  * foreachBatch → delta append, queryable between batches.
  */
object StreamingIndexer {

  /** Start ingesting `stream` (must contain `docIdCol` + the index's field
    * columns) into the published index at `root`.
    */
  def start(stream: DataFrame, docIdCol: String, root: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) applyBatch(batch, docIdCol, root, batchId)
      }
      .start()

  /** Apply one micro-batch idempotently (exposed for the crash-replay
    * spec). Safe to call with the same `batchId` any number of times and
    * from a fresh attempt after a crash at any internal point.
    */
  private[graft] def applyBatch(batch: DataFrame, docIdCol: String,
      root: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val m = IndexCatalog.manifest(spark, root)
    if (m.get("stream.lastBatch").exists(_.toLong >= batchId)) return
    if (m.contains("append.staged") &&
        m.get("stream.stagedBatch").contains(batchId.toString)) {
      // crashed between THIS batch's stage-commit and publish: the staged
      // tables already hold exactly this delta — finish the publish (which
      // promotes the marker) instead of re-staging a duplicate
      IndexCatalog.resumeAppend(spark, root)
      return
    }
    // finish any unrelated pending append (e.g. a crashed direct
    // addDocuments) before staging this batch
    IndexCatalog.resumeAppend(spark, root)
    val g = IndexCatalog.stageAppend(batch, docIdCol, root,
      extra = Map("stream.stagedBatch" -> batchId.toString))
    IndexCatalog.publishAppend(spark, root, g)
  }
}
