package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Persisted IVF (inverted-file) ANN index: the nearest-centroid cell
  * assignment ([[Similarity.ivfCellCol]]) written ONCE as a cell-partitioned
  * parquet table over the shared [[VecStore]], with the centroid table
  * persisted alongside — the deployment shape the SCALE NOTE on
  * [[Similarity.ivfProbeCandidates]] promises: a query ranks the ≤ nCells
  * stored centroids driver-side and reads ONLY the `nProbe` probe-cell
  * partitions, never the corpus.
  *
  * vs [[VectorIndex]] (sign-LSH buckets over the same store): the IVF
  * quantizer ADAPTS to the data's density — centroids are corpus samples,
  * so dense regions get more cells and a clustered embedding space
  * concentrates each query's true neighbors into few cells — where the
  * hyperplane family is data-oblivious. Recall is identical to the
  * index-free [[Similarity.ivfCosineTopK]] by construction (same centroid
  * sample, same argmax assignment, same probe ranking; parity pinned by
  * IvfIndexSpec).
  *
  * The quantizer is FROZEN at build time (standard IVF behavior): appends
  * assign new vectors against the STORED centroids, so probe semantics
  * never shift under a stream of deltas — rebuilding under a new root is
  * the sanctioned way to re-train. Appends are crash-safe and O(delta)
  * (the [[VecStore]] stage/publish protocol).
  *
  * Layout under `root/`:
  * {{{
  *   manifest.json   config.dim / config.nCells, row count, published flag
  *   centroids/      parquet (cell: int, cv: array<float>) — nCells rows
  *   vectors/        parquet (vec_id, v: array<float>), partitioned by cell
  * }}}
  */
object IvfIndex {

  /** Build (or resume) the persisted IVF index. Idempotent: an already
    * published index with matching config is left untouched; a mismatched
    * config is rejected (rebuild under a new root instead of silently
    * mixing quantizers). The centroid table is written BEFORE the vector
    * store's manifest commit, so `published=true` always implies a
    * complete centroid table (a crash in between leaves orphan dirs the
    * next build overwrites).
    *
    * `refineIters` > 0 sharpens the sampled quantizer with that many
    * Lloyd rounds ([[Similarity.kmeansRefine]], cosine geometry) before
    * anything is written — same layout, same probe semantics, measurably
    * better recall per probed cell on clustered embedding spaces
    * (BENCH.md "IVF refinement"). The default stays 0 because refinement
    * is deterministic only up to floating-point reduction order, and the
    * oracle-gated contract queries need bit-stable centroids.
    */
  def build(emb: DataFrame, id: String, vec: String, dim: Int, nCells: Int,
      root: String, refineIters: Int = 0): Unit = {
    val spark = emb.sparkSession
    val m = IndexCatalog.readManifest(spark, root)
    if (m.getOrElse("published", "") == "true") {
      require(m.get("config.dim").contains(dim.toString) &&
        m.get("config.nCells").contains(nCells.toString) &&
        m.getOrElse("config.refineIters", "0") == refineIters.toString,
        s"IVF index at $root published with different config " +
          s"(dim=${m.get("config.dim")}, nCells=${m.get("config.nCells")}, " +
          s"refineIters=${m.getOrElse("config.refineIters", "0")})")
      return
    }
    val cents = Similarity.kmeansRefine(emb, vec,
      Similarity.ivfCentroids(emb, id, vec, nCells), refineIters)
    writeCentroids(spark, root, cents)
    VecStore.writeInitial(assigned(emb, id, vec, cents), "cell", nCells,
      root, Map(
        "config.dim" -> dim.toString,
        "config.nCells" -> nCells.toString,
        "config.refineIters" -> refineIters.toString),
      expectDim = Some(dim))
  }

  private def writeCentroids(spark: SparkSession, root: String,
      cents: Array[(Int, Array[Float])]): Unit = {
    import spark.implicits._
    val f = IndexCatalog.fs(spark, root)
    val tmp = s"$root/_tmp_centroids"
    f.delete(new Path(tmp), true)
    cents.toSeq.map { case (c, v) => (c, v.toSeq) }
      .toDF("cell", "cv").coalesce(1).write.parquet(tmp)
    val dst = new Path(s"$root/centroids")
    f.delete(dst, true)
    f.rename(new Path(tmp), dst)
    ()
  }

  private def assigned(emb: DataFrame, id: String, vec: String,
      cents: Array[(Int, Array[Float])]): DataFrame =
    emb.select(col(id).cast("long").as("vec_id"), col(vec).as("v"),
      Similarity.ivfCellCol(col(vec), cents).as("cell"))

  /** The frozen centroid table, cell-ordered. The collect is bounded by
    * `config.nCells` (same capped-driver-collect contract as
    * [[Similarity.ivfCentroids]]); one small-file read, the corpus is
    * never touched.
    */
  def centroids(spark: SparkSession, root: String): Array[(Int, Array[Float])] = {
    val m = IndexCatalog.readManifest(spark, root)
    require(m.getOrElse("published", "") == "true", s"no published IVF index at $root")
    spark.read.parquet(s"$root/centroids")
      .orderBy(col("cell").asc)
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
  }

  /** Crash-safe incremental append against the FROZEN quantizer: the delta
    * is assigned with the stored centroids and staged/published by the
    * [[VecStore]] protocol. Cost is O(delta) + one centroid-table read.
    * New vec_ids must not collide with stored ones.
    */
  def addVectors(emb: DataFrame, id: String, vec: String, root: String): Unit = {
    val spark = emb.sparkSession
    resumeAppend(spark, root)
    val g = stageVectors(emb, id, vec, root)
    VecStore.publish(spark, root, "cell", g)
  }

  /** Phase 1 only (STAGE) — exposed for the crash-resume test and the
    * streaming ingester's batch marker.
    */
  private[graft] def stageVectors(emb: DataFrame, id: String, vec: String,
      root: String, extra: Map[String, String] = Map.empty): Int = {
    val spark = emb.sparkSession
    val m = IndexCatalog.readManifest(spark, root)
    require(m.getOrElse("published", "") == "true", s"no published IVF index at $root")
    val cents = centroids(spark, root)
    VecStore.stage(assigned(emb, id, vec, cents), "cell",
      m("config.nCells").toInt, root, extra,
      expectDim = Some(m("config.dim").toInt))
  }

  /** Finish an append interrupted between stage-commit and publish-commit.
    * No-op when nothing is pending.
    */
  def resumeAppend(spark: SparkSession, root: String): Unit =
    VecStore.resumeAppend(spark, root, "cell")

  /** The stored vectors (with their `cell` partition column). */
  def read(spark: SparkSession, root: String): DataFrame =
    VecStore.read(spark, root)

  /** A query handle with the centroid table and vector scan resolved ONCE:
    * the repeated-query serving shape this index exists for must not pay a
    * centroid-parquet Spark job plus two manifest round-trips per top-k
    * call (the per-call static methods below do exactly that — fine for a
    * one-shot, wrong in a query loop). Centroids are frozen at build time,
    * so the cached array can never go stale; appends only ADD vectors, and
    * a reader that must see them reopens (same contract as re-reading any
    * snapshot table).
    */
  final class Reader private[IvfIndex] (
      val centroids: Array[(Int, Array[Float])], vectors: DataFrame) {

    /** The query's probe cells: the `nProbe` stored centroids with the
      * highest cosine vs the query (tiebreak: lowest cell) — pure driver
      * arithmetic over the nCells-capped cached centroid array, ranked
      * with the SAME index-order double accumulation as the distributed
      * assignment column. Probe sets are NESTED in `nProbe`, so recall is
      * monotone in the knob by construction.
      */
    def probeSet(query: Seq[Float], nProbe: Int): Seq[Int] = {
      require(nProbe > 0 && nProbe <= centroids.length, "0 < nProbe <= nCells")
      Similarity.rankCells(centroids, query).take(nProbe)
    }

    /** All stored vectors in the query's probe cells with exact cosine vs
      * the query — a partition-pruned scan (`cell IN probes` is a hive
      * partition predicate, so only probe-cell files are read; asserted by
      * IvfIndexSpec).
      */
    def probeCandidates(query: Seq[Float], nProbe: Int): DataFrame = {
      val probes = probeSet(query, nProbe)
      val q = array(query.map(v => lit(v)): _*)
      vectors
        .filter(col("cell").isin(probes: _*))
        .select(col("vec_id"), Similarity.cosine(col("v"), q).as("cos"))
    }

    /** Approximate cosine top-k over the persisted IVF index. `nProbe`
      * trades cells scanned for recall; `nProbe = nCells` is exact.
      */
    def annTopK(query: Seq[Float], k: Int, nProbe: Int): DataFrame =
      probeCandidates(query, nProbe)
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(k)
  }

  /** Open a query handle: one manifest read + one small centroid-table
    * job, amortized over every query made through it.
    */
  def open(spark: SparkSession, root: String): Reader =
    new Reader(centroids(spark, root), read(spark, root))

  /** One-shot convenience (pays the open() cost per call — use a
    * [[Reader]] in a query loop).
    */
  def probeSet(spark: SparkSession, root: String, query: Seq[Float],
      nProbe: Int): Seq[Int] =
    open(spark, root).probeSet(query, nProbe)

  /** One-shot convenience — see [[Reader.probeCandidates]]. */
  def probeCandidates(spark: SparkSession, root: String,
      query: Seq[Float], nProbe: Int): DataFrame =
    open(spark, root).probeCandidates(query, nProbe)

  /** One-shot convenience — see [[Reader.annTopK]]. */
  def annTopK(spark: SparkSession, root: String, query: Seq[Float],
      k: Int, nProbe: Int): DataFrame =
    open(spark, root).annTopK(query, k, nProbe)
}
