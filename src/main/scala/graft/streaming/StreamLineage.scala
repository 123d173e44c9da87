package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Checkpoint-lineage identity for the exactly-once ingesters.
  *
  * `stream.lastBatch` alone cannot guard replays: foreachBatch batch ids
  * restart at 0 whenever a stream gets a NEW checkpoint (a fresh source
  * attached to an existing index, or the old checkpoint dir deleted — a
  * routine ops event). A bare `batchId <= lastBatch` check would then
  * silently drop the new lineage's first batches even though they carry
  * brand-new documents. The markers therefore bind the batch id to the
  * STREAM's identity — Spark's own query id (`<checkpoint>/metadata`,
  * minted once per checkpoint dir and stable across restarts of it) — as
  * `<queryId>:<batchId>`; the replay guard fires only when the recorded
  * lineage matches the calling stream's. Markers written by a pre-lineage
  * engine version (bare numbers) conservatively match any lineage,
  * preserving their old semantics.
  */
private[graft] object StreamLineage {

  /** The calling stream's lineage id: Spark's streaming query id from the
    * checkpoint metadata file (written at query start, so it exists by the
    * time any foreachBatch body runs; re-read per batch — one tiny-file
    * read, no Spark job).
    */
  def id(spark: SparkSession, checkpoint: String): String = {
    val p = new Path(s"$checkpoint/metadata")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(p),
      s"no streaming checkpoint metadata at $checkpoint — lineage ids come " +
        "from a started query's checkpoint dir")
    val in = f.open(p)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1))
      .getOrElse(sys.error(s"malformed checkpoint metadata at $checkpoint"))
  }

  /** The manifest marker value for one (lineage, batch). The publish
    * commit promotes it to a PER-LINEAGE key (`stream.lastBatch.<id>`,
    * [[graft.index.IndexCatalog.promoteStreamMarker]]) — a single shared
    * key could only guard the latest writer, so a retired stream
    * restarting from its old checkpoint AFTER a replacement stream had
    * attached (serialized writers, so the single-writer rule allows it)
    * would replay its last batch as a duplicate. Lineage keys are one
    * short manifest line per checkpoint ever attached — bounded by ops
    * reality, not data size.
    */
  def marker(streamId: String, batchId: Long): String = s"$streamId:$batchId"

  /** Whether the manifest records this batch (or a later one of the SAME
    * lineage) as already applied. A different lineage's marker never
    * suppresses a batch; a legacy bare-number `stream.lastBatch` (written
    * by a pre-lineage engine, when one checkpoint per index root was the
    * undocumented assumption) suppresses any lineage's.
    */
  def applied(m: Map[String, String], streamId: String, batchId: Long): Boolean =
    m.get(s"stream.lastBatch.$streamId").exists(_.toLong >= batchId) ||
      m.get("stream.lastBatch").exists { v =>
        v.split(":", 2) match {
          case Array(id, b) => id == streamId && b.toLong >= batchId
          case _ => v.toLong >= batchId // legacy pre-lineage marker
        }
      }
}
