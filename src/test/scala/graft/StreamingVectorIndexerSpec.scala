package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.index.{IvfIndex, VectorIndex}
import graft.pipeline.Similarity
import graft.streaming.StreamingVectorIndexer

/** Streaming ANN ingestion: micro-batches land as O(batch) appends into
  * either quantizer family, with EXACTLY-ONCE batch semantics under
  * foreachBatch replays (the stream.stagedBatch/lastBatch manifest
  * protocol — a replayed or crash-resumed batch never duplicates rows).
  */
class StreamingVectorIndexerSpec extends TestBase {

  private val dim = 16

  private def vecsDf(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong,
      Array.tabulate(dim)(d => (((i * 37 + d * 13) % 19) - 9).toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("streamed micro-batches into VectorIndex equal a one-shot build") {
    val root = Files.createTempDirectory("graft_svec_").toString
    val ckpt = Files.createTempDirectory("graft_svec_ckpt_").toString
    VectorIndex.build(vecsDf(0 until 100), "vec_id", "embedding", dim, 5, root)

    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val rows = (100 until 300).map(i => (i.toLong,
      Array.tabulate(dim)(d => (((i * 37 + d * 13) % 19) - 9).toFloat).toSeq))
    mem.addData(rows.take(100): _*)
    // ProcessingTime(0): keep the query live across both addData rounds
    // (the AvailableNow default drains only what exists at start)
    val q = StreamingVectorIndexer.start(stream, "vec_id", "embedding", root,
      ckpt, trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q.processAllAvailable()
    mem.addData(rows.drop(100): _*)
    q.processAllAvailable(); q.stop()

    assert(VectorIndex.read(spark, root).count() == 300)
    // sign-LSH assignment is stateless: streamed == one-shot build
    val full = Files.createTempDirectory("graft_svecfull_").toString
    VectorIndex.build(vecsDf(0 until 300), "vec_id", "embedding", dim, 5, full)
    assert(VectorIndex.read(spark, root).select("vec_id", "bucket")
      .exceptAll(VectorIndex.read(spark, full).select("vec_id", "bucket"))
      .count() == 0)
  }

  test("streamed micro-batches into IvfIndex keep the FROZEN quantizer") {
    val root = Files.createTempDirectory("graft_sivf_").toString
    val ckpt = Files.createTempDirectory("graft_sivf_ckpt_").toString
    IvfIndex.build(vecsDf(0 until 100), "vec_id", "embedding", dim, 8, root)
    val frozen = IvfIndex.centroids(spark, root)

    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val rows = (100 until 300).map(i => (i.toLong,
      Array.tabulate(dim)(d => (((i * 37 + d * 13) % 19) - 9).toFloat).toSeq))
    mem.addData(rows.take(70): _*)
    val q = StreamingVectorIndexer.start(stream, "vec_id", "embedding", root,
      ckpt, trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q.processAllAvailable()
    mem.addData(rows.drop(70): _*)
    q.processAllAvailable(); q.stop()

    // centroids untouched; every streamed row assigned under them
    assert(IvfIndex.centroids(spark, root).map(_._2.toSeq).toSeq ==
      frozen.map(_._2.toSeq).toSeq)
    val want = vecsDf(0 until 300).select(col("vec_id"),
      Similarity.ivfCellCol(col("embedding"), frozen).as("cell"))
    assert(IvfIndex.read(spark, root).select("vec_id", "cell")
      .exceptAll(want).count() == 0)
    // full probe over the streamed store is exact over the union
    val qv = vecsDf(0 until 300).filter(col("vec_id") === 222)
      .head().getSeq[Float](1)
    val got = IvfIndex.annTopK(spark, root, qv, 25, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Similarity.cosineTopK(vecsDf(0 until 300), "vec_id", "embedding",
      qv, 25).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact)
  }

  test("replayed batch ids are no-ops; crashed attempts resume without duplicates") {
    val root = Files.createTempDirectory("graft_srepl_").toString
    VectorIndex.build(vecsDf(0 until 50), "vec_id", "embedding", dim, 4, root)

    // batch 0 applied, then replayed (checkpoint lost after publish)
    val b0 = vecsDf(50 until 80)
    StreamingVectorIndexer.applyBatch(b0, "vec_id", "embedding", root, 0L, "sA")
    assert(VectorIndex.read(spark, root).count() == 80)
    StreamingVectorIndexer.applyBatch(b0, "vec_id", "embedding", root, 0L, "sA")
    assert(VectorIndex.read(spark, root).count() == 80,
      "replayed batch must be a no-op")

    // batch 1 crashes between stage-commit and publish; the replay must
    // FINISH the staged attempt, not stage a second copy
    val b1 = vecsDf(80 until 120)
    VectorIndex.stageVectors(b1, "vec_id", "embedding", root,
      Map("stream.stagedBatch" -> "sA:1"))
    assert(VectorIndex.read(spark, root).count() == 80,
      "staged-only batch must not touch the live store")
    StreamingVectorIndexer.applyBatch(b1, "vec_id", "embedding", root, 1L, "sA")
    assert(VectorIndex.read(spark, root).count() == 120)
    StreamingVectorIndexer.applyBatch(b1, "vec_id", "embedding", root, 1L, "sA")
    assert(VectorIndex.read(spark, root).count() == 120)

    // a crashed DIRECT addVectors (no marker) is finished before the next
    // stream batch, and both land exactly once
    val direct = vecsDf(120 until 140)
    VectorIndex.stageVectors(direct, "vec_id", "embedding", root)
    val b2 = vecsDf(140 until 160)
    StreamingVectorIndexer.applyBatch(b2, "vec_id", "embedding", root, 2L, "sA")
    assert(VectorIndex.read(spark, root).count() == 160)
    // the direct delta's rows are present exactly once
    assert(VectorIndex.read(spark, root)
      .filter(col("vec_id") >= 120 && col("vec_id") < 140).count() == 20)
    // and a very late replay of an old batch is still a no-op
    StreamingVectorIndexer.applyBatch(b0, "vec_id", "embedding", root, 0L, "sA")
    assert(VectorIndex.read(spark, root).count() == 160)
  }

  test("a NEW checkpoint lineage's batch 0 is applied, not dropped as a replay") {
    // round-5 review finding: foreachBatch ids restart at 0 under a new
    // checkpoint (fresh source attached, or the old checkpoint dir
    // deleted); a bare `batchId <= lastBatch` guard silently dropped the
    // new stream's first batches. Markers are lineage-bound now.
    val root = Files.createTempDirectory("graft_slin_").toString
    VectorIndex.build(vecsDf(0 until 50), "vec_id", "embedding", dim, 4, root)
    StreamingVectorIndexer.applyBatch(vecsDf(50 until 70), "vec_id", "embedding",
      root, 3L, "sA")
    assert(VectorIndex.read(spark, root).count() == 70)

    // stream sB (new checkpoint) starts at batch 0 with NEW vectors
    StreamingVectorIndexer.applyBatch(vecsDf(70 until 90), "vec_id", "embedding",
      root, 0L, "sB")
    assert(VectorIndex.read(spark, root).count() == 90,
      "a new lineage's batch 0 carries new vectors and must be applied")
    // sB's own replay is a no-op...
    StreamingVectorIndexer.applyBatch(vecsDf(70 until 90), "vec_id", "embedding",
      root, 0L, "sB")
    assert(VectorIndex.read(spark, root).count() == 90)
    // ...and so is a LATE replay from the retired sA (serialized writers):
    // per-lineage keys keep both guards live simultaneously
    StreamingVectorIndexer.applyBatch(vecsDf(50 until 70), "vec_id", "embedding",
      root, 3L, "sA")
    assert(VectorIndex.read(spark, root).count() == 90)

    // legacy bare-number markers (pre-lineage engine) suppress ANY lineage
    import graft.streaming.StreamLineage
    assert(StreamLineage.applied(Map("stream.lastBatch" -> "4"), "sC", 4L))
    assert(!StreamLineage.applied(Map("stream.lastBatch" -> "4"), "sC", 5L))
    assert(StreamLineage.applied(Map("stream.lastBatch.sC" -> "4"), "sC", 3L))
    assert(!StreamLineage.applied(Map("stream.lastBatch.sC" -> "4"), "sD", 3L))
  }
}
