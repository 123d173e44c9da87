package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.index.VectorIndex
import graft.pipeline.Similarity

/** Persisted ANN index: parity with the index-free recompute path, and —
  * the point of persisting — PARTITION PRUNING: the probe scan must touch
  * only the ≤ nBits+1 probe-bucket partitions, never the whole store.
  */
class VectorIndexSpec extends TestBase {

  private val dim = 16
  private val nBits = 6

  private def vectors = {
    import spark.implicits._
    (0L until 300L).map(i =>
      (i, Array.tabulate(dim)(d => (((i * 37 + d * 13) % 19) - 9).toFloat)))
      .toDF("vec_id", "embedding")
  }

  private def builtRoot(): String = {
    val root = Files.createTempDirectory("graft_vec_").toString
    VectorIndex.build(vectors, "vec_id", "embedding", dim, nBits, root)
    root
  }

  test("annTopK matches the index-free lshCosineTopK exactly") {
    val root = builtRoot()
    val q = vectors.filter(col("vec_id") === 7).head().getSeq[Float](1)
    val got = VectorIndex.annTopK(spark, root, q, 25).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Similarity.lshCosineTopK(vectors, "vec_id", "embedding",
      dim, nBits, q, 25).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("probe scan prunes to the probe-bucket partitions only") {
    val root = builtRoot()
    val q = vectors.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val probes = VectorIndex.probeSet(spark, root, q).toSet
    assert(probes.size == nBits + 1)

    val df = VectorIndex.probeCandidates(spark, root, q)
    df.collect() // execute so AQE finalizes and scan metrics fill
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters: [bucket"),
      s"no partition filter on the vector scan:\n$plan")
    val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
    // the vectors scan must have selected ≤ |probes| partitions (the
    // 1-row query-bucket job has its own scan-free plan)
    val vecScan = scans.find(_.toString.contains("vectors")).getOrElse(
      fail(s"no file scan over the vector store in:\n$plan"))
    val nParts = vecScan.selectedPartitions.partitionCount
    assert(nParts <= probes.size,
      s"probe scan read $nParts partitions for ${probes.size} probes")
    // and strictly fewer than the store holds (i.e. pruning really pruned)
    val total = spark.read.parquet(s"$root/vectors")
      .select("bucket").distinct().count()
    assert(nParts < total, s"scan read all $total partitions")
  }

  test("build is idempotent; mismatched config is rejected") {
    val root = builtRoot()
    val before = Files.readString(java.nio.file.Paths.get(s"$root/manifest.json"))
    VectorIndex.build(vectors, "vec_id", "embedding", dim, nBits, root)
    val after = Files.readString(java.nio.file.Paths.get(s"$root/manifest.json"))
    assert(before == after)
    intercept[IllegalArgumentException] {
      VectorIndex.build(vectors, "vec_id", "embedding", dim, nBits + 1, root)
    }
  }

  test("addVectors(delta) == build(union); staged crash is resumed") {
    import spark.implicits._
    val all = vectors
    val a = all.filter(col("vec_id") < 200)
    val b = all.filter(col("vec_id") >= 200)
    val root = Files.createTempDirectory("graft_vecapp_").toString
    VectorIndex.build(a, "vec_id", "embedding", dim, nBits, root)
    VectorIndex.addVectors(b, "vec_id", "embedding", root)

    val full = Files.createTempDirectory("graft_vecfull_").toString
    VectorIndex.build(all, "vec_id", "embedding", dim, nBits, full)
    val q = all.filter(col("vec_id") === 123).head().getSeq[Float](1)
    val got = VectorIndex.annTopK(spark, root, q, 30).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = VectorIndex.annTopK(spark, full, q, 30).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want && got.nonEmpty)
    // stored assignment identical to a one-shot build over the union
    assert(VectorIndex.read(spark, root).select("vec_id", "bucket")
      .exceptAll(VectorIndex.read(spark, full).select("vec_id", "bucket"))
      .count() == 0)

    // crash between stage-commit and publish: manifest says staged, the
    // live store is untouched — readers see the pre-append index; resume
    // completes the publish idempotently
    val root2 = Files.createTempDirectory("graft_vecapp2_").toString
    VectorIndex.build(a, "vec_id", "embedding", dim, nBits, root2)
    VectorIndex.stageVectors(b, "vec_id", "embedding", root2)
    assert(VectorIndex.read(spark, root2).count() == 200,
      "staged-only append must not touch the live store")
    VectorIndex.resumeAppend(spark, root2)
    assert(VectorIndex.read(spark, root2).count() == 300)
    val got2 = VectorIndex.annTopK(spark, root2, q, 30).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got2 == want)
    // a second resume is a no-op
    VectorIndex.resumeAppend(spark, root2)
    assert(VectorIndex.read(spark, root2).count() == 300)
  }

  test("maxHamming widens the probe set monotonically; recall@k grows to 1") {
    val root = builtRoot()
    val q = vectors.filter(col("vec_id") === 11).head().getSeq[Float](1)
    val p0 = VectorIndex.probeSet(spark, root, q, maxHamming = 0).toSet
    val p1 = VectorIndex.probeSet(spark, root, q, maxHamming = 1).toSet
    val p2 = VectorIndex.probeSet(spark, root, q, maxHamming = 2).toSet
    assert(p0.size == 1 && p0.subsetOf(p1) && p1.subsetOf(p2))
    assert(p1.size == nBits + 1)
    assert(p2.size == 1 + nBits + nBits * (nBits - 1) / 2)

    // recall@k against the exact brute-force top-k must be monotone in the
    // probe radius (more buckets probed ⇒ supersets of candidates)
    val k = 20
    val exact = Similarity.cosineTopK(vectors, "vec_id", "embedding", q, k)
      .collect().map(_.getLong(0)).toSet
    def recall(h: Int): Double = {
      val got = VectorIndex.annTopK(spark, root, q, k, maxHamming = h)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(got).size.toDouble / k
    }
    val (r0, r1, r2) = (recall(0), recall(1), recall(2))
    assert(r0 <= r1 && r1 <= r2, s"recall not monotone: $r0 / $r1 / $r2")
    // with 22 of 64 buckets probed on 300 vectors the H2 probe must find
    // a solid majority of the true top-20 (deterministic corpus: measured
    // well above this floor)
    assert(r2 >= 0.5, s"H2 recall@$k too low: $r2")
  }

  test("clustered vectors beat uniform vectors on recall at equal probes") {
    // the round-4 recall curve used worst-case uniform vectors; a real
    // embedding space is clustered, and the hyperplane hash must preserve
    // that structure: at the SAME probe count (Hamming ≤ 1, 9 of 256
    // buckets) the Gaussian-mixture fixture's recall@20 must beat the
    // structureless control's. Deterministic (seeded fixture, fixed
    // queries) — not a statistical test.
    import graft.tools.VectorFixtures
    val n = 2000; val d = 64; val bits = 8; val k = 20
    def meanRecall(emb: org.apache.spark.sql.DataFrame, tag: String): Double = {
      val root = Files.createTempDirectory(s"graft_vecfix_$tag").toString
      VectorIndex.build(emb, "vec_id", "embedding", d, bits, root)
      val qids = Seq(3L, 401L, 807L, 1203L, 1609L, 1999L)
      val qs = emb.filter(col("vec_id").isin(qids: _*)).collect()
        .map(_.getSeq[Float](1))
      val recalls = qs.map { q =>
        val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, k)
          .collect().map(_.getLong(0)).toSet
        val got = VectorIndex.annTopK(spark, root, q, k, maxHamming = 1)
          .collect().map(_.getLong(0)).toSet
        exact.intersect(got).size.toDouble / k
      }
      recalls.sum / recalls.length
    }
    val clustered = meanRecall(
      VectorFixtures.clustered(spark, n, d, n / 40, 0.25, 7L).cache(), "c")
    val uniform = meanRecall(VectorFixtures.uniform(spark, n, d, 7L).cache(), "u")
    assert(clustered > uniform,
      s"clustered recall $clustered not above uniform $uniform at equal probes")
    assert(clustered >= 0.6, s"clustered recall@$k too low: $clustered")
  }

  test("probeCandidates equals a brute-force filter of the same buckets") {
    val root = builtRoot()
    val q = vectors.filter(col("vec_id") === 42).head().getSeq[Float](1)
    val probes = VectorIndex.probeSet(spark, root, q)
    val got = VectorIndex.probeCandidates(spark, root, q)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Similarity.lshProbeCandidates(vectors, "vec_id", "embedding",
      dim, nBits, q)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want && got.nonEmpty)
    // every candidate really sits in a probe bucket of the stored index
    val stored = VectorIndex.read(spark, root)
      .filter(col("bucket").isin(probes: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet == stored)
  }
}
