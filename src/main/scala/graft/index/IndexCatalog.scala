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

  /** Current directory of a small swappable table (termdict/fieldstats).
    * A fresh build writes the plain name; each append publishes a NEW
    * generation-named dir (`termdict.g3`) and repoints this manifest key in
    * the same atomic manifest commit as `append.gen` — so there is never a
    * moment where the live table is renamed away: readers either see the
    * old manifest (old dir, still present) or the new one (new dir,
    * complete before the commit).
    */
  private def tableDir(m: Map[String, String], table: String): String =
    m.getOrElse(s"table.$table", table)

  def bucketOf(term: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(term), lit(nBuckets)).cast("int")

  // ---- tiny JSON-ish manifest (no external deps) ----

  private[index] def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[index] def readManifest(spark: SparkSession, root: String): Map[String, String] = {
    val f = fs(spark, root); val mp = new Path(s"$root/manifest.json")
    // one `"key": "value"` pair per line
    def parse(p: Path): Map[String, String] = {
      val in = f.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r.findAllMatchIn(s)
        .map(m => m.group(1) -> m.group(2)).toMap
    }
    if (f.exists(mp)) return parse(mp)
    // writeManifest's swap is delete-then-rename (Hadoop FileSystem.rename
    // won't overwrite): a crash between the two leaves no manifest.json
    // but a COMPLETE _manifest.json.tmp (the tmp is fully written+closed
    // before the delete). Promote it best-effort; when the rename fails
    // (read-only mount) or another reader/writer wins the race, fall back
    // to parsing whichever file exists — the read path must stay usable
    // without its repair side effect.
    val tmp = new Path(s"$root/_manifest.json.tmp")
    if (!f.exists(tmp)) return Map.empty
    val renamed = try f.rename(tmp, mp) catch { case _: Throwable => false }
    if (f.exists(mp)) parse(mp)
    else if (!renamed && f.exists(tmp)) parse(tmp)
    else Map.empty
  }

  private[index] def writeManifest(spark: SparkSession, root: String,
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
    *
    * The manifest row count comes from an [[org.apache.spark.sql.Observation]]
    * attached to the WRITE job itself (one pass) — at 100-TB scale a
    * `read.parquet(tmp).count()` after the write would pay a second full
    * scan of the postings table just for a metadata number.
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
    val obs = org.apache.spark.sql.Observation()
    val w = df.observe(obs, count(lit(1)).as("rows")).write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp)
    val rows = obs.get("rows").asInstanceOf[Long]
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
    val statsRow = spark.read.parquet(s"$root/${tableDir(m, "fieldstats")}").head()
    val n = statsRow.getLong(0)
    val sums = (0 until nf).map(i => statsRow.getLong(i + 1)).toArray
    InvertedIndex(
      postings = spark.read.parquet(s"$root/postings"),
      docstats = spark.read.parquet(s"$root/docstats"),
      termdict = spark.read.parquet(s"$root/${tableDir(m, "termdict")}"),
      tombstones = tombstones, numFields = nf, hasTombstones = hasTombs,
      statsHint = Some(FieldStats(n, sums, sums.map(_.toDouble / n.toDouble))))
  }

  /** Block-table format version; bumped when the [[PostingBlocks.Block]]
    * schema changes (v2: per-field `min_fl` metadata for the tight BM25
    * bound). Stale-format persisted blocks are rebuilt by [[buildBlocks]]
    * and refused by [[readBlocks]].
    */
  val BlockFormat = "2"

  /** Optional compressed-block stage (resumable like the rest): posting
    * blocks with block-max metadata for [[graft.query.BlockMaxTopK]],
    * bucket-partitioned like the postings.
    */
  def buildBlocks(spark: SparkSession, root: String,
      blockSize: Long = PostingBlocks.DefaultBlockSize): Unit = {
    var m = readManifest(spark, root)
    require(m.getOrElse("published", "") == "true", s"no published index at $root")
    if (m.contains("stage.blocks.rows")) {
      if (m.getOrElse("config.blockFormat", "1") == BlockFormat) return
      // stale on-disk format: drop and rebuild
      fs(spark, root).delete(new Path(s"$root/blocks"), true)
      m = m - "stage.blocks.rows" - "stage.blocks.secs"
      writeManifest(spark, root, m)
    }
    val nf = m("config.numFields").toInt
    val nb = m("config.nBuckets").toInt
    m = stage(spark, root, "blocks", m, partitionBy = Seq("bucket")) {
      PostingBlocks.fromPostings(spark.read.parquet(s"$root/postings"), nf, blockSize)
        .toDF().withColumn("bucket", bucketOf(col("term"), nb))
        .repartition(nb, col("bucket"))
        .sortWithinPartitions(col("term"), col("block_id"))
    }
    writeManifest(spark, root, m + ("config.blockSize" -> blockSize.toString) +
      ("config.blockFormat" -> BlockFormat))
  }

  def readBlocks(spark: SparkSession, root: String): (org.apache.spark.sql.Dataset[PostingBlocks.Block], Long) = {
    import spark.implicits._
    val m = readManifest(spark, root)
    // the stage key is cleared by vacuum/append when blocks go stale; a
    // dir without the key must not be served
    require(m.contains("stage.blocks.rows"),
      s"no current block stage at $root — run buildBlocks after build/vacuum/append")
    require(m.getOrElse("config.blockFormat", "1") == BlockFormat,
      s"block table at $root has format ${m.getOrElse("config.blockFormat", "1")}, " +
        s"engine expects $BlockFormat — re-run buildBlocks")
    val bs = m.getOrElse("config.blockSize", PostingBlocks.DefaultBlockSize.toString).toLong
    // KEEP the bucket partition column (the Block encoder tolerates the
    // extra field): BlockMaxTopK adds a `bucket IN (…)` predicate for the
    // expanded terms, so the metadata/probe/decode scans touch only the
    // query's bucket partitions — without it every WAND query reads every
    // bucket dir of the block store
    (spark.read.parquet(s"$root/blocks").as[PostingBlocks.Block], bs)
  }

  /** Incremental append — the reference's headline mutation
    * (`add_document`, "optimized for insertion speed",
    * /root/reference/README.md:6) as a batch delta: index ONLY the new
    * docs, append their postings/docstats into the existing bucket layout,
    * and merge the small dictionary/stats tables. Cost is O(delta), not
    * O(corpus). New doc keys must not collide with existing ones.
    *
    * CRASH-SAFE protocol (two phases, manifest-keyed like build()):
    *  1. STAGE: all four outputs (delta docstats, bucketed delta postings,
    *     FULL merged termdict, FULL merged fieldstats — the last two are
    *     small) are written under `_append_stage_<g>/` while the published
    *     index is untouched, then `append.staged = g` is recorded.
    *  2. PUBLISH ([[publishAppend]]): move staged part-files into the live
    *     dirs under generation-unique names, promote termdict/fieldstats
    *     into generation-NAMED dirs, then commit `append.gen = g` and the
    *     `table.*` pointers in ONE manifest write. Every step is
    *     idempotent (move-if-present, promote-if-staged-exists), so a
    *     crash anywhere is resumed by the next
    *     [[addDocuments]]/[[resumeAppend]] call — a partial append is
    *     always detectable (`append.staged` without the matching
    *     `append.gen`) and never half-applied silently.
    *
    * Reader visibility during publish: delta postings become visible
    * before the dictionary/stats commit lands — structurally consistent
    * (postings carry their own fl) with momentarily-stale df/avg, the same
    * lag shape as the reference's latent deletion. The dictionary/stats
    * swap itself is a manifest REPOINT at an already-complete generation
    * dir: the live tables are never renamed away, so there is no window —
    * crash included — where a reader finds them missing.
    */
  def addDocuments(docs: DataFrame, docIdCol: String, root: String): InvertedIndex = {
    val spark = docs.sparkSession
    resumeAppend(spark, root) // finish any interrupted predecessor first
    val g = stageAppend(docs, docIdCol, root)
    publishAppend(spark, root, g)
    read(spark, root)
  }

  /** Phase 1 only (STAGE): writes the four staged outputs and records
    * `append.staged` — the published index is untouched until
    * [[publishAppend]]. Exposed for the crash-resume test, which
    * "crashes" here and recovers via [[resumeAppend]].
    */
  private[graft] def stageAppend(docs: DataFrame, docIdCol: String,
      root: String): Int = {
    val spark = docs.sparkSession
    var m = readManifest(spark, root)
    require(m.getOrElse("published", "") == "true", s"no published index at $root")
    // A CRASHED VACUUM must be completed before any append may stage:
    // the crashed vacuum's finished stages wrote PLAIN termdict/fieldstats
    // dirs while the manifest still points at generation dirs — an append
    // publishing in that state would (a) GC those plain dirs as "old
    // generations" and (b) leave the resumed vacuum's stage keys pointing
    // at tables that never saw this append's docs. Finishing the vacuum
    // first restores the invariant every append assumes: the manifest's
    // stage keys describe the live tables.
    if (m.getOrElse("vacuum.pending", "") == "true") {
      vacuum(spark, root)
      m = readManifest(spark, root)
    }
    val fieldCols = m("config.fields").split(",").toSeq
    val nf = fieldCols.size
    val nb = m("config.nBuckets").toInt
    val g = m.getOrElse("append.gen", "0").toInt + 1
    val stageDir = s"$root/_append_stage_$g"
    val f = fs(spark, root)
    f.delete(new Path(stageDir), true)

    val delta = IndexBuilder.build(docs, docIdCol, fieldCols)
    delta.docstats.write.parquet(s"$stageDir/docstats")
    delta.postings.withColumn("bucket", bucketOf(col("term"), nb))
      .repartition(nb, col("bucket"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.partitionBy("bucket").parquet(s"$stageDir/postings")
    spark.read.parquet(s"$root/${tableDir(m, "termdict")}")
      .select(col("term"), col("df"))
      .union(spark.read.parquet(s"$stageDir/postings")
        .groupBy(col("term")).agg(sum(col("occ")).as("df")))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .withColumn("bucket", bucketOf(col("term"), nb))
      .write.parquet(s"$stageDir/termdict")
    val aggs = count(lit(1)).as("n") +:
      (0 until nf).map(i => coalesce(sum(element_at(col("fl"), i + 1)), lit(0L)).as(s"s$i"))
    spark.read.parquet(s"$root/docstats")
      .union(spark.read.parquet(s"$stageDir/docstats"))
      .agg(aggs.head, aggs.tail: _*)
      .write.parquet(s"$stageDir/fieldstats")
    // per-bucket lineage of the DELTA, recorded at stage time: appends must
    // not rescan the whole posting store per publish (at streaming-ingest
    // rates that is an O(corpus) metadata pass per micro-batch), so the
    // global `lineage.postings` stays as-of the last build/vacuum and each
    // append adds its own delta line.
    val deltaPerBucket = spark.read.parquet(s"$stageDir/postings")
      .groupBy("bucket").count().orderBy("bucket").collect()
      .map(r => s"${r.getInt(0)}=${r.getLong(1)}").mkString(";")
    writeManifest(spark, root, readManifest(spark, root) +
      ("append.staged" -> g.toString) +
      (s"lineage.append.$g" -> deltaPerBucket))
    g
  }

  /** Recover an append interrupted between STAGE-commit and PUBLISH-commit.
    * No-op when nothing is pending. (An interrupt BEFORE `append.staged`
    * was recorded leaves only an orphan `_append_stage_*` dir, which the
    * next append overwrites.)
    */
  def resumeAppend(spark: SparkSession, root: String): Unit = {
    val m = readManifest(spark, root)
    m.get("append.staged").foreach { g =>
      if (m.getOrElse("append.gen", "0") != g) publishAppend(spark, root, g.toInt)
    }
  }

  /** Idempotent publish of staged append generation `g`: every step checks
    * the filesystem state it is about to change, so re-running after a
    * crash at any point completes the remainder.
    */
  private def publishAppend(spark: SparkSession, root: String, g: Int): Unit = {
    val f = fs(spark, root)
    val stageDir = s"$root/_append_stage_$g"

    // move staged data files into the live dirs under generation-unique
    // names: a re-run skips files already moved (src gone or dst present)
    def moveFiles(srcDir: String, dstDir: String): Unit = {
      val sp = new Path(srcDir)
      if (!f.exists(sp)) return // whole dir already consumed
      f.listStatus(sp).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.startsWith("bucket="))
          moveFiles(s"$srcDir/$name", s"$dstDir/$name")
        else if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
          val dst = new Path(s"$dstDir/append_${g}_$name")
          f.mkdirs(new Path(dstDir))
          if (!f.exists(dst)) f.rename(st.getPath, dst)
          else f.delete(st.getPath, false)
        }
      }
    }
    moveFiles(s"$stageDir/postings", s"$root/postings")
    moveFiles(s"$stageDir/docstats", s"$root/docstats")

    // promote the small merged tables into GENERATION-NAMED dirs; the live
    // table is never renamed away — the single manifest write below
    // repoints `table.<name>` and `append.gen` atomically, so a crash
    // anywhere leaves the index readable (old manifest → old dir, still
    // intact). Skip when the staged copy is gone AND the generation dir
    // exists (already promoted by a previous attempt).
    def promote(table: String): Unit = {
      val staged = new Path(s"$stageDir/$table")
      val dst = new Path(s"$root/$table.g$g")
      if (f.exists(staged)) {
        f.delete(dst, true) // partial promote from a crashed attempt
        f.rename(staged, dst)
      }
      require(f.exists(dst), s"append $g: neither staged nor promoted $table")
      ()
    }
    promote("termdict")
    promote("fieldstats")

    // commit: ONE manifest write bumps the generation, repoints both small
    // tables, clears the pending marker (the delta's per-bucket lineage was
    // recorded at stage time — no O(corpus) rescan here), and drops any
    // block stage (stale for the appended doc ranges)
    var m = readManifest(spark, root)
    val hadBlocks = m.contains("stage.blocks.rows")
    if (hadBlocks) m = m - "stage.blocks.rows" - "stage.blocks.secs"
    writeManifest(spark, root,
      m - "append.staged" +
        ("append.gen" -> g.toString) +
        ("table.termdict" -> s"termdict.g$g") +
        ("table.fieldstats" -> s"fieldstats.g$g"))

    // post-commit garbage collection (all idempotent; readers holding the
    // OLD manifest race this — the same already-published-read lag shape
    // as the delta posting files above)
    if (hadBlocks) f.delete(new Path(s"$root/blocks"), true)
    def gcOldGens(table: String): Unit =
      f.listStatus(new Path(root)).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory &&
            (n == table || (n.startsWith(s"$table.g") && n != s"$table.g$g")))
          f.delete(st.getPath, true)
      }
    gcOldGens("termdict")
    gcOldGens("fieldstats")
    f.delete(new Path(stageDir), true)
    ()
  }

  /** Persisted remove, DataFrame-native (reference `remove_document`
    * lazy-delete): the tombstone set is appended as a parquet write of a
    * DISTRIBUTED id set — a predicate-derived removal of 10^11 docs never
    * transits the driver. The first column of `ids` is the doc key.
    *
    * A CRASHED VACUUM must be completed first: while `vacuum.pending` is
    * set, the compacted stage tables already exclude exactly the
    * tombstones that existed at stage time, and the resumed vacuum's
    * final commit deletes the tombstones file wholesale — a tombstone
    * appended in between would be dropped WITHOUT its postings ever
    * being compacted away (a silently resurrected doc). Finishing the
    * vacuum first restores the invariant the commit relies on:
    * tombstones == the staged compaction's input set.
    */
  def removeDocuments(root: String, ids: DataFrame): Unit = {
    val spark = ids.sparkSession
    if (readManifest(spark, root).getOrElse("vacuum.pending", "") == "true")
      vacuum(spark, root)
    ids.select(col(ids.columns.head).cast("long").as("doc_id"))
      .write.mode("append").parquet(s"$root/tombstones")
  }

  /** Driver-side convenience overload (small ad-hoc removals). */
  def removeDocuments(spark: SparkSession, root: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    removeDocuments(root, ids.toDF("doc_id"))
  }

  /** Persisted vacuum (reference `vacuum`): compact postings/docstats by
    * anti-joining tombstones, rewrite termdict, clear tombstones — a new
    * snapshot replacing the old, stage-atomic per table.
    */
  def vacuum(spark: SparkSession, root: String): Unit =
    vacuum(spark, root, crashBeforeCommit = false)

  /** Fault-injection variant for the crash-resume tests: with
    * `crashBeforeCommit` the compaction runs every stage rewrite but
    * "dies" before the final manifest commit — exactly the state a real
    * mid-vacuum crash leaves (`vacuum.pending` set, stage keys recorded,
    * `table.*` still on the pre-vacuum generation dirs).
    */
  private[graft] def vacuum(spark: SparkSession, root: String,
      crashBeforeCommit: Boolean): Unit = {
    val f = fs(spark, root)
    // a staged-but-unpublished append must land BEFORE the compaction:
    // its staged termdict/fieldstats were merged against the pre-vacuum
    // corpus, and publishing them after the rewrite would resurrect the
    // purged docs' df/stats
    resumeAppend(spark, root)
    val mPre = readManifest(spark, root)
    // `vacuum.pending` marks a compaction whose stages may have completed
    // but whose final commit didn't — re-entering here finishes it (the
    // stage keys make the rewrites skips); without the marker, a crash
    // after the stage rewrites would strand the `table.*` pointers on the
    // pre-vacuum generation dirs forever
    val pending = mPre.getOrElse("vacuum.pending", "") == "true"
    if (!f.exists(new Path(s"$root/tombstones")) && !pending) return
    val idx = read(spark, root)
    var m = mPre
    // clear stage/lineage keys so the rewrites run (on RESUME keep them —
    // completed stages skip), but KEEP the table.* generation pointers:
    // readers stay on the pre-vacuum termdict/fieldstats (with live
    // tombstone recount, still correct) until the final commit below
    // atomically repoints them at the rewritten tables
    if (!pending)
      m = m -- m.keys.filter(k => k.startsWith("stage.") || k.startsWith("lineage."))
    m = m + ("vacuum.pending" -> "true")
    writeManifest(spark, root, m)
    // the block table (if built) still holds purged postings: drop it NOW —
    // its manifest stage key was just cleared, and leaving the dir behind
    // would let readBlocks serve stale data until the next buildBlocks
    f.delete(new Path(s"$root/blocks"), true)
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
    if (crashBeforeCommit) return // fault injection: die before the commit
    // vacuum rewrote the whole posting store: refresh the global lineage
    // (append deltas were folded in by the rewrite, so their lines go)
    val perBucket = spark.read.parquet(s"$root/postings")
      .groupBy("bucket").count().orderBy("bucket").collect()
      .map(r => s"${r.getInt(0)}=${r.getLong(1)}").mkString(";")
    // FINAL COMMIT (one manifest write): repoint the small tables at the
    // rewritten plain dirs (drop the table.* generation keys), clear the
    // pending marker, publish. Tombstones are deleted only AFTER the
    // commit: against the compacted postings the anti-join and live-df
    // recount are no-ops, so queries are correct in both orders, while
    // deleting first would leave a crash window with stale gen-dir df and
    // no tombstones
    writeManifest(spark, root,
      (m -- m.keys.filter(k =>
        k.startsWith("lineage.append.") || k.startsWith("table."))) -
        "vacuum.pending" +
        ("published" -> "true") + ("lineage.postings" -> perBucket))
    f.delete(new Path(s"$root/tombstones"), true)
    // GC the superseded generation dirs (post-commit; also re-swept by the
    // next append's publish if this crashes)
    f.listStatus(new Path(root)).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory &&
          (n.startsWith("termdict.g") || n.startsWith("fieldstats.g")))
        f.delete(st.getPath, true)
    }
    ()
  }
}
