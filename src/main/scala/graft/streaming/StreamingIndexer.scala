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
  * document frequencies, silently shifted BM25 scores). The batch marker
  * rides the index's own manifest instead (the [[StreamingVectorIndexer]]
  * protocol), bound to the stream's checkpoint lineage
  * ([[StreamLineage]] — batch ids restart at 0 under a new checkpoint, so
  * a bare id guard would silently drop a new stream's data): STAGE commits
  * `stream.stagedBatch = <queryId>:<batchId>` atomically with
  * `append.staged`, PUBLISH promotes it to the per-lineage `stream.lastBatch.<queryId>` in the
  * commit write, and a batch already recorded for the SAME lineage is a
  * no-op (a crashed attempt is first finished by the resume call, whose
  * publish promotes the marker the guard then sees).
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
        if (!batch.isEmpty)
          applyBatch(batch, docIdCol, root, batchId,
            StreamLineage.id(batch.sparkSession, checkpoint))
      }
      .start()

  /** Apply one micro-batch idempotently (exposed for the crash-replay
    * spec). Safe to call with the same `(streamId, batchId)` any number of
    * times and from a fresh attempt after a crash at any internal point.
    */
  private[graft] def applyBatch(batch: DataFrame, docIdCol: String,
      root: String, batchId: Long, streamId: String): Unit = {
    val spark = batch.sparkSession
    // finish ANY pending append first — including this very batch's
    // crashed attempt (its publish promotes the staged marker to
    // its stream.lastBatch.<id> key, which the lineage guard below catches)
    IndexCatalog.resumeAppend(spark, root)
    if (StreamLineage.applied(IndexCatalog.manifest(spark, root), streamId, batchId))
      return
    val g = IndexCatalog.stageAppend(batch, docIdCol, root,
      extra = Map("stream.stagedBatch" -> StreamLineage.marker(streamId, batchId)))
    IndexCatalog.publishAppend(spark, root, g)
  }
}
