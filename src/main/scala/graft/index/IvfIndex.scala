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
    */
  def build(emb: DataFrame, id: String, vec: String, dim: Int, nCells: Int,
      root: String): Unit = {
    val spark = emb.sparkSession
    val m = IndexCatalog.readManifest(spark, root)
    if (m.getOrElse("published", "") == "true") {
      require(m.get("config.dim").contains(dim.toString) &&
        m.get("config.nCells").contains(nCells.toString),
        s"IVF index at $root published with different config " +
          s"(dim=${m.get("config.dim")}, nCells=${m.get("config.nCells")})")
      return
    }
    val cents = Similarity.ivfCentroids(emb, id, vec, nCells)
    writeCentroids(spark, root, cents)
    VecStore.writeInitial(assigned(emb, id, vec, cents), "cell", nCells,
      root, Map(
        "config.dim" -> dim.toString,
        "config.nCells" -> nCells.toString))
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
      m("config.nCells").toInt, root, extra)
  }

  /** Finish an append interrupted between stage-commit and publish-commit.
    * No-op when nothing is pending.
    */
  def resumeAppend(spark: SparkSession, root: String): Unit =
    VecStore.resumeAppend(spark, root, "cell")

  /** The stored vectors (with their `cell` partition column). */
  def read(spark: SparkSession, root: String): DataFrame =
    VecStore.read(spark, root)

  /** The query's probe cells: the `nProbe` stored centroids with the
    * highest cosine vs the query (tiebreak: lowest cell) — pure driver
    * arithmetic over the nCells-capped centroid table, ranked with the
    * SAME index-order double accumulation as the distributed assignment
    * column. Probe sets are NESTED in `nProbe`, so recall is monotone in
    * the knob by construction.
    */
  def probeSet(spark: SparkSession, root: String, query: Seq[Float],
      nProbe: Int): Seq[Int] = {
    val cents = centroids(spark, root)
    require(nProbe > 0 && nProbe <= cents.length, "0 < nProbe <= nCells")
    Similarity.rankCells(cents, query).take(nProbe)
  }

  /** All stored vectors in the query's probe cells with exact cosine vs
    * the query — a partition-pruned scan (`cell IN probes` is a hive
    * partition predicate, so only probe-cell files are read; asserted by
    * IvfIndexSpec).
    */
  def probeCandidates(spark: SparkSession, root: String,
      query: Seq[Float], nProbe: Int): DataFrame = {
    val probes = probeSet(spark, root, query, nProbe)
    val q = array(query.map(v => lit(v)): _*)
    read(spark, root)
      .filter(col("cell").isin(probes: _*))
      .select(col("vec_id"), Similarity.cosine(col("v"), q).as("cos"))
  }

  /** Approximate cosine top-k over the persisted IVF index. `nProbe`
    * trades cells scanned for recall; `nProbe = nCells` is exact.
    */
  def annTopK(spark: SparkSession, root: String, query: Seq[Float],
      k: Int, nProbe: Int): DataFrame =
    probeCandidates(spark, root, query, nProbe)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
}
