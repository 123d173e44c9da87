package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Persisted ANN index over an embedding column: the sign-LSH bucket
  * assignment written ONCE as a bucket-partitioned parquet table (manifest +
  * atomic publish via [[VecStore]], the [[IndexCatalog]] pattern), so a
  * top-k query is a PARTITION-PRUNED scan of the ≤ nBits+1 multiprobe
  * buckets instead of recomputing `signLshBucket` over the whole corpus per
  * query.
  *
  * This is the scale answer to the query-time plan in
  * [[graft.pipeline.Similarity.lshProbeCandidates]] (kept as the index-free
  * one-shot variant): at 10^12 vectors the per-query corpus rescan is a
  * full-table scan per query; here the probe set resolves against hive
  * partition metadata and the scan touches ~(nBits+1)/2^nBits of the store
  * — with nBits=8, 9 of 256 buckets. Recall is identical by construction
  * (same hash family, same multiprobe set; parity pinned by
  * VectorIndexSpec). The data-ADAPTIVE alternative is [[IvfIndex]] (same
  * store, nearest-centroid cells instead of hyperplane buckets).
  */
object VectorIndex {

  /** Build (or resume) the persisted vector index. Idempotent: an already
    * published index with matching config is left untouched; a mismatched
    * config is rejected (rebuild under a new root instead of silently
    * mixing hash families).
    */
  def build(emb: DataFrame, id: String, vec: String, dim: Int, nBits: Int,
      root: String): Unit = {
    val spark = emb.sparkSession
    val m = IndexCatalog.readManifest(spark, root)
    if (m.getOrElse("published", "") == "true") {
      require(m.get("config.dim").contains(dim.toString) &&
        m.get("config.nBits").contains(nBits.toString),
        s"vector index at $root published with different config " +
          s"(dim=${m.get("config.dim")}, nBits=${m.get("config.nBits")})")
      return
    }
    VecStore.writeInitial(assigned(emb, id, vec, dim, nBits), "bucket",
      1 << nBits, root, Map(
        "config.dim" -> dim.toString,
        "config.nBits" -> nBits.toString),
      expectDim = Some(dim))
  }

  private def assigned(emb: DataFrame, id: String, vec: String,
      dim: Int, nBits: Int): DataFrame =
    emb.select(col(id).cast("long").as("vec_id"), col(vec).as("v"),
      Similarity.signLshBucket(col(vec), dim, nBits).as("bucket"))

  /** Crash-safe incremental append — the ANN mirror of
    * [[IndexCatalog.addDocuments]], simpler because bucket assignment has
    * no global state (no merged dictionary/stats): the delta is assigned
    * and staged bucket-partitioned, `append.staged` is recorded, then the
    * staged files move into the live bucket dirs under generation-unique
    * names and one manifest write commits `append.gen`. Every step is
    * idempotent; an interrupted append is finished by the next
    * [[addVectors]] call (or explicitly via [[resumeAppend]]). Cost is
    * O(delta). New vec_ids must not collide with stored ones.
    */
  def addVectors(emb: DataFrame, id: String, vec: String, root: String): Unit = {
    val spark = emb.sparkSession
    resumeAppend(spark, root)
    val g = stageVectors(emb, id, vec, root)
    VecStore.publish(spark, root, "bucket", g)
  }

  /** Phase 1 only (STAGE) — exposed for the crash-resume test, which
    * "crashes" here and recovers via [[resumeAppend]].
    */
  private[graft] def stageVectors(emb: DataFrame, id: String, vec: String,
      root: String, extra: Map[String, String] = Map.empty): Int = {
    val spark = emb.sparkSession
    val m = IndexCatalog.readManifest(spark, root)
    require(m.getOrElse("published", "") == "true", s"no published vector index at $root")
    val (dim, nBits) = (m("config.dim").toInt, m("config.nBits").toInt)
    VecStore.stage(assigned(emb, id, vec, dim, nBits), "bucket", 1 << nBits,
      root, extra, expectDim = Some(dim))
  }

  /** Finish an append interrupted between stage-commit and publish-commit.
    * No-op when nothing is pending.
    */
  def resumeAppend(spark: SparkSession, root: String): Unit =
    VecStore.resumeAppend(spark, root, "bucket")

  /** The stored vectors (with their `bucket` partition column). */
  def read(spark: SparkSession, root: String): DataFrame =
    VecStore.read(spark, root)

  private def config(spark: SparkSession, root: String): (Int, Int) = {
    val m = IndexCatalog.readManifest(spark, root)
    require(m.getOrElse("published", "") == "true", s"no published vector index at $root")
    (m("config.dim").toInt, m("config.nBits").toInt)
  }

  /** The query's multiprobe bucket set: its own LSH bucket plus every
    * bucket within Hamming distance `maxHamming` of it (distance 1 is the
    * index-free path's probe set; distance 2 is the recall knob — 37 of
    * 256 buckets at nBits=8, recall curve in BENCH.md). One 1-row job —
    * the corpus is never touched.
    */
  def probeSet(spark: SparkSession, root: String, query: Seq[Float],
      maxHamming: Int = 1): Seq[Int] = {
    import spark.implicits._
    require(maxHamming >= 0 && maxHamming <= 2, "maxHamming in 0..2")
    val (dim, nBits) = config(spark, root)
    val qb = Seq(Tuple1(query)).toDF("qv")
      .select(Similarity.signLshBucket(col("qv").cast("array<float>"), dim, nBits))
      .head().getInt(0)
    val h1 = (0 until nBits).map(b => qb ^ (1 << b))
    val h2 = for (a <- 0 until nBits; b <- a + 1 until nBits)
      yield qb ^ (1 << a) ^ (1 << b)
    (Seq(qb) ++ (if (maxHamming >= 1) h1 else Nil) ++
      (if (maxHamming >= 2) h2 else Nil)).distinct
  }

  /** All stored vectors in the query's multiprobe buckets with exact cosine
    * vs the query — a partition-pruned scan (`bucket IN probes` is a hive
    * partition predicate, so only probe-bucket files are read; asserted by
    * VectorIndexSpec).
    *
    * `filter` (FILTERED ANN — "nearest neighbors within a subset", the
    * facet+vector-search production shape): a one-column `vec_id` set of
    * allowed vectors, semi-joined against the candidates AFTER partition
    * pruning (the big side is already cut to the probe buckets; AQE
    * broadcasts a small filter set). POST-filtering, so recall against the
    * filtered ground truth degrades as the filter gets more selective
    * (candidates drop out, nothing replaces them) — raise `maxHamming` to
    * compensate, or for extreme selectivity brute-force the filtered
    * subset instead ([[graft.pipeline.Similarity.cosineTopK]] on the
    * pre-filtered frame).
    */
  def probeCandidates(spark: SparkSession, root: String,
      query: Seq[Float], maxHamming: Int = 1,
      filter: Option[DataFrame] = None): DataFrame = {
    val probes = probeSet(spark, root, query, maxHamming)
    val q = array(query.map(v => lit(v)): _*)
    val cand = read(spark, root).filter(col("bucket").isin(probes: _*))
    val kept = filter.fold(cand) { f =>
      require(f.columns.contains("vec_id"), "filter needs a vec_id column")
      cand.join(f.select(col("vec_id")), Seq("vec_id"), "left_semi")
    }
    kept.select(col("vec_id"), Similarity.cosine(col("v"), q).as("cos"))
  }

  /** Approximate cosine top-k over the persisted index. `maxHamming` trades
    * buckets probed for recall (see BENCH.md recall table); `filter`
    * restricts results to an allowed `vec_id` set (see [[probeCandidates]]).
    */
  def annTopK(spark: SparkSession, root: String, query: Seq[Float],
      k: Int, maxHamming: Int = 1, filter: Option[DataFrame] = None): DataFrame =
    probeCandidates(spark, root, query, maxHamming, filter)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
}
