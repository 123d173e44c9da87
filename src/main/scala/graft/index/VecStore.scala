package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for persisted partition-pruned vector stores: a
  * parquet table `(vec_id, v)` hive-partitioned by one small integer
  * "coarse bucket" column, with a manifest + atomic publish (the
  * [[IndexCatalog]] pattern) and crash-safe O(delta) appends.
  *
  * [[VectorIndex]] (sign-LSH buckets) and [[IvfIndex]] (nearest-centroid
  * cells) are both thin quantizer layers over this store — they differ only
  * in how the partition id is computed and which partitions a query probes;
  * the write path, manifest lifecycle, and append protocol are identical.
  *
  * Layout under `root/`:
  * {{{
  *   manifest.json   quantizer config, row count, published flag
  *   vectors/        parquet (vec_id, v: array<float>), partitioned by pcol
  * }}}
  */
private[graft] object VecStore {

  /** Write the initial store in one pass. `assigned` must have columns
    * `(vec_id: long, v: array<float>, <pcol>: int)`. One shuffle task per
    * partition value ⇒ one file per partition dir (not every map task
    * spraying into every dir); vec_id-sorted within for stable reads. The
    * row count rides the write job via an Observation — no second full
    * read of the freshly written store. The manifest commit (`published`)
    * is LAST: a crash before it leaves orphan dirs the next build
    * overwrites.
    *
    * `expectDim`: every quantizer maps a wrong-length or null-element
    * vector to SOME partition (cell 0 / a junk bucket) rather than
    * erroring per row — correct for dirty data in a one-shot scan, but an
    * ingest whose vectors can never match a query must fail LOUDLY. The
    * dim audit rides the same Observation as the row count (zero extra
    * passes) and aborts BEFORE the manifest commit, so a bad batch leaves
    * only an orphan dir.
    */
  def writeInitial(assigned: DataFrame, pcol: String, nParts: Int,
      root: String, config: Map[String, String],
      expectDim: Option[Int] = None): Unit = {
    val spark = assigned.sparkSession
    val f = IndexCatalog.fs(spark, root)
    val tmp = s"$root/_tmp_vectors"
    f.delete(new Path(tmp), true)
    val obs = org.apache.spark.sql.Observation()
    assigned
      .repartition(nParts, col(pcol))
      .sortWithinPartitions(col("vec_id"))
      .observe(obs, count(lit(1)).as("rows"), badDimAgg(expectDim))
      .write.partitionBy(pcol).parquet(tmp)
    val rows = obs.get("rows").asInstanceOf[Long]
    requireDims(obs, expectDim, root)
    val dst = new Path(s"$root/vectors")
    f.delete(dst, true)
    f.rename(new Path(tmp), dst)
    IndexCatalog.writeManifest(spark, root,
      config + ("rows" -> rows.toString) + ("published" -> "true"))
  }

  /** Count of rows whose vector is null / wrong-length / has null
    * elements (always observed; a None `expectDim` just skips the
    * post-write check so legacy callers keep their semantics).
    */
  private def badDimAgg(expectDim: Option[Int]) = {
    val d = expectDim.getOrElse(-1)
    sum(when(col("v").isNull
      .or(size(col("v")) =!= lit(d))
      .or(exists(col("v"), e => e.isNull)), 1L).otherwise(0L)).as("bad_dim")
  }

  private def requireDims(obs: org.apache.spark.sql.Observation,
      expectDim: Option[Int], root: String): Unit =
    expectDim.foreach { d =>
      val bad = Option(obs.get("bad_dim")).fold(0L)(_.asInstanceOf[Long])
      require(bad == 0L,
        s"$bad vector(s) with dim != $d (or null elements) in the batch " +
          s"for $root — such vectors would be unsearchable; aborting before " +
          "the manifest commit (only an orphan stage dir is left)")
    }

  /** Phase 1 of an append (STAGE): write the assigned delta
    * partition-sorted under a generation-unique stage dir and commit
    * `append.staged`. Idempotent per generation; a crash after the commit
    * is finished by [[resumeAppend]]. `extra` entries ride the same
    * stage-commit manifest write (e.g. the streaming ingester's
    * `stream.stagedBatch` marker — committed atomically with the stage,
    * so a replayed micro-batch can recognize its own crashed attempt).
    */
  def stage(assigned: DataFrame, pcol: String, nParts: Int,
      root: String, extra: Map[String, String] = Map.empty,
      expectDim: Option[Int] = None): Int = {
    val spark = assigned.sparkSession
    val m = IndexCatalog.readManifest(spark, root)
    require(m.getOrElse("published", "") == "true",
      s"no published vector store at $root")
    val g = m.getOrElse("append.gen", "0").toInt + 1
    val stageDir = s"$root/_vec_stage_$g"
    val f = IndexCatalog.fs(spark, root)
    f.delete(new Path(stageDir), true)
    val obs = org.apache.spark.sql.Observation()
    assigned
      .repartition(nParts, col(pcol))
      .sortWithinPartitions(col("vec_id"))
      // one pass: count AND dim audit ride the write
      .observe(obs, count(lit(1)).as("rows"), badDimAgg(expectDim))
      .write.partitionBy(pcol).parquet(stageDir)
    val deltaRows = obs.get("rows").asInstanceOf[Long]
    requireDims(obs, expectDim, root) // before the stage-commit write
    IndexCatalog.writeManifest(spark, root, IndexCatalog.readManifest(spark, root) ++
      extra +
      ("append.staged" -> g.toString) +
      (s"append.$g.rows" -> deltaRows.toString))
    g
  }

  /** Finish an append interrupted between stage-commit and publish-commit.
    * No-op when nothing is pending.
    */
  def resumeAppend(spark: SparkSession, root: String, pcol: String): Unit = {
    val m = IndexCatalog.readManifest(spark, root)
    m.get("append.staged").foreach { g =>
      if (m.getOrElse("append.gen", "0") != g) publish(spark, root, pcol, g.toInt)
    }
  }

  /** Phase 2 of an append (PUBLISH): move staged files into live partition
    * dirs under generation-unique names (re-runs skip files already moved —
    * src gone or dst present), then one manifest write commits
    * `append.gen`. Every step is idempotent. A `stream.stagedBatch` marker
    * left by [[graft.streaming.StreamingVectorIndexer]] is promoted to
    * `stream.lastBatch` IN the commit write — publish and batch-applied
    * are one atomic manifest transition, whichever code path (the
    * ingester, a direct addVectors resume, or an explicit resumeAppend)
    * finishes the crashed append.
    */
  def publish(spark: SparkSession, root: String, pcol: String, g: Int): Unit = {
    val f = IndexCatalog.fs(spark, root)
    val stageDir = s"$root/_vec_stage_$g"
    def moveFiles(srcDir: String, dstDir: String): Unit = {
      val sp = new Path(srcDir)
      if (!f.exists(sp)) return
      f.listStatus(sp).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith(s"$pcol="))
          moveFiles(s"$srcDir/$n", s"$dstDir/$n")
        else if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) {
          val dst = new Path(s"$dstDir/append_${g}_$n")
          f.mkdirs(new Path(dstDir))
          if (!f.exists(dst)) f.rename(st.getPath, dst)
          else f.delete(st.getPath, false)
        }
      }
    }
    moveFiles(stageDir, s"$root/vectors")
    val m = IndexCatalog.readManifest(spark, root)
    val newRows = m.getOrElse("rows", "0").toLong +
      m.getOrElse(s"append.$g.rows", "0").toLong
    val promoted = IndexCatalog.promoteStreamMarker(m)
    IndexCatalog.writeManifest(spark, root,
      promoted - "append.staged" - s"append.$g.rows" +
        ("append.gen" -> g.toString) + ("rows" -> newRows.toString))
    f.delete(new Path(stageDir), true)
    ()
  }

  /** The store's manifest (for family dispatch / batch markers — the
    * manifest format itself stays [[IndexCatalog]]-private).
    */
  def manifest(spark: SparkSession, root: String): Map[String, String] =
    IndexCatalog.readManifest(spark, root)

  /** The stored vectors (with their partition column). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val m = IndexCatalog.readManifest(spark, root)
    require(m.getOrElse("published", "") == "true",
      s"no published vector store at $root")
    spark.read.parquet(s"$root/vectors")
  }
}
