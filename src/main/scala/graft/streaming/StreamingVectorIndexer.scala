package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.{IvfIndex, VecStore, VectorIndex}

/** Structured-Streaming ingestion into a persisted ANN index — the
  * embedding mirror of [[StreamingIndexer]]: each micro-batch of new
  * vectors becomes one O(batch) crash-safe [[VecStore]] append into
  * whichever quantizer family the root was built with ([[VectorIndex]]
  * sign-LSH buckets or [[IvfIndex]] frozen-centroid cells — dispatched on
  * the manifest config, so one ingester serves both).
  *
  * EXACTLY-ONCE batches, not just exactly-once stage: foreachBatch replays
  * a micro-batch when the job dies between the append's publish and the
  * streaming checkpoint commit — a plain `addVectors` per batch would then
  * stage the same delta twice (duplicate vectors, silently wrong top-k
  * counts). The batch marker rides the store's own manifest instead, bound
  * to the stream's checkpoint lineage ([[StreamLineage]] — batch ids
  * restart at 0 under a new checkpoint, so a bare id guard would silently
  * drop a new stream's vectors):
  *
  *  - STAGE commits `stream.stagedBatch = <queryId>:<batchId>` atomically
  *    with `append.staged` (one manifest write);
  *  - PUBLISH promotes it to the per-lineage `stream.lastBatch.<queryId>` in the commit write
  *    ([[VecStore.publish]]) — append-applied and batch-recorded are one
  *    atomic transition, whichever code path finishes a crashed append;
  *  - a batch already recorded for the SAME lineage is a no-op (a crashed
  *    attempt is first finished by the resume call, whose publish promotes
  *    the marker the guard then sees).
  *
  * StreamingVectorIndexerSpec fuzzes the crash points; the external gate
  * is q46 (streamed IVF ingestion, full-corpus DuckDB oracle with the
  * centroid sample pinned to the build slice — a dropped or duplicated
  * batch breaks the hash).
  */
object StreamingVectorIndexer {

  /** Start ingesting `stream` (must contain `idCol` + `vecCol`) into the
    * published vector index at `root`.
    */
  def start(stream: DataFrame, idCol: String, vecCol: String, root: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          applyBatch(batch, idCol, vecCol, root, batchId,
            StreamLineage.id(batch.sparkSession, checkpoint))
      }
      .start()

  /** Apply one micro-batch idempotently (exposed for the crash-replay
    * spec). Safe to call with the same `(streamId, batchId)` any number of
    * times and from a fresh attempt after a crash at any internal point.
    */
  private[graft] def applyBatch(batch: DataFrame, idCol: String,
      vecCol: String, root: String, batchId: Long, streamId: String): Unit = {
    val spark = batch.sparkSession
    val pcol = partitionCol(VecStore.manifest(spark, root))
    // finish ANY pending append first — including this very batch's
    // crashed attempt (its publish promotes the staged marker to
    // its stream.lastBatch.<id> key, which the lineage guard below catches)
    VecStore.resumeAppend(spark, root, pcol)
    val m = VecStore.manifest(spark, root)
    if (StreamLineage.applied(m, streamId, batchId)) return
    val marker = Map("stream.stagedBatch" -> StreamLineage.marker(streamId, batchId))
    val g =
      if (isIvf(m)) IvfIndex.stageVectors(batch, idCol, vecCol, root, marker)
      else VectorIndex.stageVectors(batch, idCol, vecCol, root, marker)
    VecStore.publish(spark, root, pcol, g)
  }

  private def isIvf(m: Map[String, String]): Boolean =
    m.contains("config.nCells")

  private def partitionCol(m: Map[String, String]): String = {
    require(m.getOrElse("published", "") == "true",
      "no published vector index at the given root")
    if (isIvf(m)) "cell" else "bucket"
  }

  /** Finish a crashed append at `root` without a new batch (convenience
    * for non-streaming callers; the ingester itself resumes inline).
    */
  def resume(spark: SparkSession, root: String): Unit = {
    val m = VecStore.manifest(spark, root)
    VecStore.resumeAppend(spark, root, partitionCol(m))
  }
}
