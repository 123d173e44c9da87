package graft.index

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted index layout with checkpoint-resumable build stages, atomic
  * publish, and per-partition lineage (north_rule requirements). The
  * catalog boundary is deliberately thin — snapshot dirs + a JSON manifest
  * giving atomic-publish semantics — so an Iceberg catalog can replace it
  * where the runtime jar exists (none in this sandbox).
  *
  * Layout under `root/`:
  * {{{
  *   manifest.json      completed stages, row counts, per-bucket lineage
  *   docstats/          parquet (doc_id, fl)
  *   postings/          parquet, hive-partitioned by bucket=pmod(xxhash64(term), B)
  *   termdict/          parquet (term, df, bucket)
  *   fieldstats/        parquet single row (n, sums)
  *   tombstones/        parquet (doc_id), absent until a remove
  * }}}
  *
  * Stage DAG (each stage is written to `_tmp_<stage>` then atomically
  * renamed, and recorded in the manifest — a rerun of [[build]] skips
  * completed stages and derives later stages from the PERSISTED outputs of
  * earlier ones, so a killed build resumes where it stopped):
  *
  *   docstats → postings → termdict → fieldstats → publish
  *
  * Hash-bucketing `postings` by term gives query-time partition pruning:
  * once the expansion set is resolved against the (tiny) term dictionary,
  * the posting scan touches only the buckets of the expanded terms —
  * at 10^12-doc scale that is the difference between scanning the whole
  * posting store and a few thousandths of it.
  */
object IndexCatalog {

  val Stages: Seq[String] = Seq("docstats", "postings", "termdict", "fieldstats")

  def bucketOf(term: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(term), lit(nBuckets)).cast("int")

  // ---- tiny JSON-ish manifest (no external deps) ----

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readManifest(spark: SparkSession, root: String): Map[String, String] = {
    val f = fs(spark, root); val mp = new Path(s"$root/manifest.json")
    if (!f.exists(mp)) return Map.empty
    val in = f.open(mp)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // one `"key": "value"` pair per line
    "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  private def writeManifest(spark: SparkSession, root: String,
      entries: Map[String, String]): Unit = {
    val f = fs(spark, root)
    val body = entries.toSeq.sorted
      .map { case (k, v) => s"""  "$k": "$v"""" }.mkString("{\n", ",\n", "\n}\n")
    val tmp = new Path(s"$root/_manifest.json.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dst = new Path(s"$root/manifest.json")
    if (f.exists(dst)) f.delete(dst, false)
    f.rename(tmp, dst)
    ()
  }

  /** Run one stage if not already recorded: produce `df`, write it to a tmp
    * dir, atomically rename into place, record rows + duration + lineage.
    */
  private def stage(spark: SparkSession, root: String, name: String,
      manifest: Map[String, String], partitionBy: Seq[String] = Nil)(
      df: => DataFrame): Map[String, String] = {
    if (manifest.contains(s"stage.$name.rows")) return manifest // resume: skip
    val f = fs(spark, root)
    val tmp = s"$root/_tmp_$name"
    val dst = new Path(s"$root/$name")
    f.delete(new Path(tmp), true)
    val t0 = System.nanoTime()
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp)
    val rows = spark.read.parquet(tmp).count()
    if (f.exists(dst)) f.delete(dst, true)
    f.rename(new Path(tmp), dst)
    val secs = (System.nanoTime() - t0) / 1e9
    val m2 = manifest +
      (s"stage.$name.rows" -> rows.toString) +
      (s"stage.$name.secs" -> f"$secs%.3f")
    writeManifest(spark, root, m2)
    m2
  }

  /** Persisted, resumable index build. Safe to re-invoke after a crash:
    * completed stages are skipped and later stages read the persisted
    * outputs of earlier ones instead of recomputing the lineage.
    */
  def build(docs: DataFrame, docIdCol: String, fieldCols: Seq[String],
      root: String, nBuckets: Int = 64): InvertedIndex = {
    val spark = docs.sparkSession
    var m = readManifest(spark, root)
    val mem = IndexBuilder.build(docs, docIdCol, fieldCols)

    m = stage(spark, root, "docstats", m)(mem.docstats)
    m = stage(spark, root, "postings", m, partitionBy = Seq("bucket")) {
      // repartition ON the bucket key before the partitioned write: one
      // task per bucket ⇒ one file per bucket, instead of every map task
      // spraying a file into every bucket dir (the small-files problem —
      // at 32 tasks × 64 buckets that is 2048 files and the write is
      // file-open-bound). Sorting within partitions by (term, doc_id)
      // gives parquet row-group min/max pruning for the query-time
      // `term IN (…)` filter and doc-ordered lists for block encoding.
      mem.postings.withColumn("bucket", bucketOf(col("term"), nBuckets))
        .repartition(nBuckets, col("bucket"))
        .sortWithinPartitions(col("term"), col("doc_id"))
    }
    // termdict derives from the PERSISTED postings (resume-correct and
    // cheaper than re-tokenizing)
    m = stage(spark, root, "termdict", m) {
      spark.read.parquet(s"$root/postings")
        .groupBy(col("term"), col("bucket")).agg(sum(col("occ")).as("df"))
    }
    m = stage(spark, root, "fieldstats", m) {
      val nf = fieldCols.size
      val aggs = count(lit(1)).as("n") +:
        (0 until nf).map(i => coalesce(sum(element_at(col("fl"), i + 1)), lit(0L)).as(s"s$i"))
      spark.read.parquet(s"$root/docstats").agg(aggs.head, aggs.tail: _*)
    }
    // per-bucket lineage: posting row count per partition
    if (!m.contains("lineage.postings")) {
      val perBucket = spark.read.parquet(s"$root/postings")
        .groupBy("bucket").count().orderBy("bucket").collect()
        .map(r => s"${r.getInt(0)}=${r.getLong(1)}").mkString(";")
      m = m + ("lineage.postings" -> perBucket) +
        ("config.nBuckets" -> nBuckets.toString) +
        ("config.numFields" -> fieldCols.size.toString) +
        ("config.fields" -> fieldCols.mkString(",")) +
        ("published" -> "true")
      writeManifest(spark, root, m)
    }
    read(spark, root)
  }

  /** Open a persisted index. The postings DataFrame keeps its `bucket`
    * column so the query path can prune partitions.
    */
  def read(spark: SparkSession, root: String): InvertedIndex = {
    val m = readManifest(spark, root)
    require(m.getOrElse("published", "") == "true", s"no published index at $root")
    val nf = m("config.numFields").toInt
    val f = fs(spark, root)
    val hasTombs = f.exists(new Path(s"$root/tombstones"))
    val tombstones =
      if (hasTombs) spark.read.parquet(s"$root/tombstones")
      else InvertedIndex.emptyTombstones(spark)
    val statsRow = spark.read.parquet(s"$root/fieldstats").head()
    val n = statsRow.getLong(0)
    val sums = (0 until nf).map(i => statsRow.getLong(i + 1)).toArray
    InvertedIndex(
      postings = spark.read.parquet(s"$root/postings"),
      docstats = spark.read.parquet(s"$root/docstats"),
      termdict = spark.read.parquet(s"$root/termdict"),
      tombstones = tombstones, numFields = nf, hasTombstones = hasTombs,
      statsHint = Some(FieldStats(n, sums, sums.map(_.toDouble / n.toDouble))))
  }

  /** Optional compressed-block stage (resumable like the rest): posting
    * blocks with block-max metadata for [[graft.query.BlockMaxTopK]],
    * bucket-partitioned like the postings.
    */
  def buildBlocks(spark: SparkSession, root: String,
      blockSize: Long = PostingBlocks.DefaultBlockSize): Unit = {
    var m = readManifest(spark, root)
    require(m.getOrElse("published", "") == "true", s"no published index at $root")
    if (m.contains("stage.blocks.rows")) return
    val nf = m("config.numFields").toInt
    val nb = m("config.nBuckets").toInt
    m = stage(spark, root, "blocks", m, partitionBy = Seq("bucket")) {
      PostingBlocks.fromPostings(spark.read.parquet(s"$root/postings"), nf, blockSize)
        .toDF().withColumn("bucket", bucketOf(col("term"), nb))
        .repartition(nb, col("bucket"))
        .sortWithinPartitions(col("term"), col("block_id"))
    }
    writeManifest(spark, root, m + ("config.blockSize" -> blockSize.toString))
  }

  def readBlocks(spark: SparkSession, root: String): (org.apache.spark.sql.Dataset[PostingBlocks.Block], Long) = {
    import spark.implicits._
    val m = readManifest(spark, root)
    val bs = m.getOrElse("config.blockSize", PostingBlocks.DefaultBlockSize.toString).toLong
    (spark.read.parquet(s"$root/blocks").drop("bucket").as[PostingBlocks.Block], bs)
  }

  /** Incremental append — the reference's headline mutation
    * (`add_document`, "optimized for insertion speed",
    * /root/reference/README.md:6) as a batch delta: index ONLY the new
    * docs, append their postings/docstats into the existing bucket layout,
    * and merge the small dictionary/stats tables. Cost is O(delta), not
    * O(corpus). New doc keys must not collide with existing ones.
    */
  def addDocuments(docs: DataFrame, docIdCol: String, root: String): InvertedIndex = {
    val spark = docs.sparkSession
    val m = readManifest(spark, root)
    require(m.getOrElse("published", "") == "true", s"no published index at $root")
    val fieldCols = m("config.fields").split(",").toSeq
    val nf = fieldCols.size
    val nb = m("config.nBuckets").toInt
    val delta = IndexBuilder.build(docs, docIdCol, fieldCols)

    delta.docstats.write.mode("append").parquet(s"$root/docstats")
    delta.postings.withColumn("bucket", bucketOf(col("term"), nb))
      .repartition(nb, col("bucket"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("append").partitionBy("bucket").parquet(s"$root/postings")

    // termdict/fieldstats are small: merge old + delta and atomically swap
    val f = fs(spark, root)
    val mergedDict = spark.read.parquet(s"$root/termdict")
      .select(col("term"), col("df"))
      .union(delta.termdict)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .withColumn("bucket", bucketOf(col("term"), nb))
    val tmpDict = s"$root/_tmp_termdict_merge"
    f.delete(new Path(tmpDict), true)
    mergedDict.write.parquet(tmpDict)
    f.delete(new Path(s"$root/termdict"), true)
    f.rename(new Path(tmpDict), new Path(s"$root/termdict"))

    val aggs = count(lit(1)).as("n") +:
      (0 until nf).map(i => coalesce(sum(element_at(col("fl"), i + 1)), lit(0L)).as(s"s$i"))
    val tmpStats = s"$root/_tmp_fieldstats_merge"
    f.delete(new Path(tmpStats), true)
    spark.read.parquet(s"$root/docstats").agg(aggs.head, aggs.tail: _*)
      .write.parquet(tmpStats)
    f.delete(new Path(s"$root/fieldstats"), true)
    f.rename(new Path(tmpStats), new Path(s"$root/fieldstats"))

    // blocks (if built) are now stale for the appended ranges; drop the
    // stage so the next buildBlocks re-creates it
    if (m.contains("stage.blocks.rows")) {
      f.delete(new Path(s"$root/blocks"), true)
      writeManifest(spark, root,
        m - "stage.blocks.rows" - "stage.blocks.secs")
    }
    read(spark, root)
  }

  /** Persisted remove: append tombstone ids (reference `remove_document`
    * lazy-delete).
    */
  def removeDocuments(spark: SparkSession, root: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("doc_id").write.mode("append").parquet(s"$root/tombstones")
  }

  /** Persisted vacuum (reference `vacuum`): compact postings/docstats by
    * anti-joining tombstones, rewrite termdict, clear tombstones — a new
    * snapshot replacing the old, stage-atomic per table.
    */
  def vacuum(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    if (!f.exists(new Path(s"$root/tombstones"))) return
    val idx = read(spark, root)
    var m = readManifest(spark, root)
    m = m -- m.keys.filter(k => k.startsWith("stage.") || k.startsWith("lineage."))
    writeManifest(spark, root, m)
    m = stage(spark, root, "docstats", m)(idx.liveDocstats)
    m = stage(spark, root, "postings", m, partitionBy = Seq("bucket")) {
      val nb = m("config.nBuckets").toInt
      idx.livePostings.repartition(nb, col("bucket"))
        .sortWithinPartitions(col("term"), col("doc_id"))
    }
    m = stage(spark, root, "termdict", m) {
      spark.read.parquet(s"$root/postings")
        .groupBy(col("term"), col("bucket")).agg(sum(col("occ")).as("df"))
    }
    m = stage(spark, root, "fieldstats", m) {
      val nf = idx.numFields
      val aggs = count(lit(1)).as("n") +:
        (0 until nf).map(i => coalesce(sum(element_at(col("fl"), i + 1)), lit(0L)).as(s"s$i"))
      spark.read.parquet(s"$root/docstats").agg(aggs.head, aggs.tail: _*)
    }
    f.delete(new Path(s"$root/tombstones"), true)
    writeManifest(spark, root, m + ("published" -> "true"))
  }
}
