package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.IndexCatalog

/** Structured-Streaming ingestion into a persisted index: each micro-batch
  * of new documents becomes one incremental [[IndexCatalog.addDocuments]]
  * delta (O(batch) work — the Spark analog of the reference's
  * insertion-optimized `add_document` loop, with exactly-once batches from
  * the streaming checkpoint).
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { IndexCatalog.addDocuments(batch, docIdCol, root); () }
      }
      .start()
}
