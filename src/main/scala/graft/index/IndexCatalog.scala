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

  /** Manifest read-out for cross-package engine code (the streaming
    * ingesters' batch markers / family dispatch); the manifest FORMAT
    * stays index-private.
    */
  private[graft] def manifest(spark: SparkSession, root: String): Map[String, String] =
    readManifest(spark, root)

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

  /** Promote a streaming ingester's staged batch marker into its committed
    * form, as part of a publish's single manifest write. Lineage-bound
    * markers (`<queryId>:<batchId>`, [[graft.streaming.StreamLineage]])
    * land under a PER-LINEAGE key so one retired stream's late replay can
    * never be confused with another stream's progress; bare legacy markers
    * keep the shared key and its match-any-lineage semantics.
    */
  private[graft] def promoteStreamMarker(m: Map[String, String]): Map[String, String] =
    m.get("stream.stagedBatch") match {
      case Some(v) =>
        val base = m - "stream.stagedBatch"
        v.split(":", 2) match {
          case Array(id, b) => base + (s"stream.lastBatch.$id" -> b)
          case _ => base + ("stream.lastBatch" -> v)
        }
      case None => m
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
      manifest: Map[String, String], partitionBy: Seq[String] = Nil,
      extraMetrics: Seq[(String, org.apache.spark.sql.Column)] = Nil,
      onMetrics: Map[String, Long] => Unit = _ => ())(
      df: => DataFrame): Map[String, String] = {
    if (manifest.contains(s"stage.$name.rows")) return manifest // resume: skip
    val f = fs(spark, root)
    val tmp = s"$root/_tmp_$name"
    val dst = new Path(s"$root/$name")
    f.delete(new Path(tmp), true)
    val t0 = System.nanoTime()
    val obs = org.apache.spark.sql.Observation()
    // extraMetrics ride the SAME write pass (guide §2.3: aggregate in the
    // scan you already pay for) — build() uses this to fold the global
    // field-stat sums into the docstats write instead of re-scanning the
    // persisted table in a separate job
    val metricCols = count(lit(1)).as("rows") +:
      extraMetrics.map { case (n, c) => c.as(n) }
    val w = df.observe(obs, metricCols.head, metricCols.tail: _*)
      .write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp)
    val rows = obs.get("rows").asInstanceOf[Long]
    if (extraMetrics.nonEmpty)
      onMetrics(extraMetrics.map(_._1)
        .map(n => n -> obs.get(n).asInstanceOf[Long]).toMap)
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

    // the docstats WRITE also observes the per-field token sums, so the
    // fieldstats stage below writes a literal 1-row frame instead of
    // re-scanning the persisted docstats — one corpus-sized pass saved per
    // build (stats share the scan; N itself is the stage's row count).
    // (A postings-derived docstats — groupBy(doc_id) over the persisted
    // store + zero-token anti-join — was tried to drop this pass's second
    // tokenize and MEASURED SLOWER: every doc's rows span all 64 bucket
    // partitions, so the partial agg emits ~docs×buckets rows and the
    // shuffle costs more than the tokenize it saved. Kept the two-pass
    // shape; see OPTIMIZATION_r06.md.)
    val nf = fieldCols.size
    var statSums: Option[Map[String, Long]] = None
    m = stage(spark, root, "docstats", m,
      extraMetrics = (0 until nf).map(i =>
        s"s$i" -> coalesce(sum(element_at(col("fl"), i + 1)), lit(0L))),
      onMetrics = vals => statSums = Some(vals))(mem.docstats)
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
    // cheaper than re-tokenizing). Range-partitioned + sorted ON TERM:
    // dictionary lookups are prefix (`startsWith`) and point (`term IN`)
    // predicates — both push to parquet, and with term-ordered files they
    // prune at the FILE/row-group level. At a 10^9-term vocabulary that
    // turns every query's expansion resolve from a full dictionary scan
    // into a handful of row groups; the extra range shuffle at build time
    // is over the dictionary (vocab-sized), not the corpus.
    m = stage(spark, root, "termdict", m) {
      // `rows` (posting rows per term) rides along so the per-bucket
      // lineage below folds from the VOCAB-sized dictionary instead of a
      // second full scan of the posting store; readers never see it
      // ([[termdictDf]] projects it away)
      spark.read.parquet(s"$root/postings")
        .groupBy(col("term"), col("bucket"))
        .agg(sum(col("occ")).as("df"), count(lit(1)).as("rows"))
        .repartitionByRange(col("term"))
        .sortWithinPartitions(col("term"))
    }
    m = stage(spark, root, "fieldstats", m) {
      statSums match {
        case Some(vals) =>
          // observed on the docstats write above — no re-scan; n is the
          // docstats stage's recorded row count
          val n = m("stage.docstats.rows").toLong
          spark.range(1).select(lit(n).as("n") +:
            (0 until nf).map(i => lit(vals(s"s$i")).as(s"s$i")): _*)
        case None =>
          // resume from a crashed build in a LATER JVM: the observation is
          // gone, fall back to the persisted-docstats aggregate
          val aggs = count(lit(1)).as("n") +:
            (0 until nf).map(i => coalesce(sum(element_at(col("fl"), i + 1)), lit(0L)).as(s"s$i"))
          spark.read.parquet(s"$root/docstats").agg(aggs.head, aggs.tail: _*)
      }
    }
    // per-bucket lineage: posting row count per partition — folded from
    // the dictionary's `rows` column when present (vocab-sized scan); the
    // postings re-scan remains only for resumes over a pre-`rows` termdict
    if (!m.contains("lineage.postings")) {
      val td = spark.read.parquet(s"$root/termdict")
      val perBucket = (
        if (td.columns.contains("rows"))
          td.groupBy("bucket").agg(sum(col("rows")).as("count"))
        else spark.read.parquet(s"$root/postings").groupBy("bucket").count()
      ).orderBy("bucket").collect()
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

  /** Append generations whose termdict/fieldstats live as DELTA tables
    * (`termdict.d<g>`), unioned with the base by readers — the O(vocab)
    * full-dictionary merge per append is replaced by an O(delta-vocab)
    * write, with a rollup every `compactDeltasEvery` generations bounding
    * the union width (see [[stageAppend]]).
    */
  private def deltaGens(m: Map[String, String]): Seq[String] =
    m.getOrElse("append.deltas", "").split(",").filter(_.nonEmpty).toSeq

  /** The live term dictionary: base generation unioned with any append
    * deltas (df summed per term). With no deltas this is the plain base
    * scan.
    */
  private def termdictDf(spark: SparkSession, root: String,
      m: Map[String, String]): DataFrame = {
    // explicit projection: build-time bookkeeping columns (`rows`, used
    // once for lineage) must not leak into the reader schema, and the
    // append-delta unionByName below needs both sides column-identical
    val base = spark.read.parquet(s"$root/${tableDir(m, "termdict")}")
      .select(col("term"), col("bucket"), col("df"))
    val gs = deltaGens(m)
    if (gs.isEmpty) base
    else gs.map(g => spark.read.parquet(s"$root/termdict.d$g"))
      .foldLeft(base)(_.unionByName(_))
      .groupBy(col("term"), col("bucket")).agg(sum(col("df")).as("df"))
  }

  /** The live global field stats row: base generation plus append deltas
    * (each delta is ONE row of (n, s0..)-sums over just its docs).
    */
  private def fieldstatsRow(spark: SparkSession, root: String,
      m: Map[String, String], nf: Int): org.apache.spark.sql.Row = {
    val base = spark.read.parquet(s"$root/${tableDir(m, "fieldstats")}")
    val gs = deltaGens(m)
    if (gs.isEmpty) base.head()
    else {
      val all = gs.map(g => spark.read.parquet(s"$root/fieldstats.d$g"))
        .foldLeft(base)(_.unionByName(_))
      val aggs = sum(col("n")).as("n") +:
        (0 until nf).map(i => sum(col(s"s$i")).as(s"s$i"))
      all.agg(aggs.head, aggs.tail: _*).head()
    }
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
    val statsRow = fieldstatsRow(spark, root, m, nf)
    val n = statsRow.getLong(0)
    val sums = (0 until nf).map(i => statsRow.getLong(i + 1)).toArray
    InvertedIndex(
      postings = spark.read.parquet(s"$root/postings"),
      docstats = spark.read.parquet(s"$root/docstats"),
      termdict = termdictDf(spark, root, m),
      tombstones = tombstones, numFields = nf, hasTombstones = hasTombs,
      statsHint = Some(FieldStats(n, sums, sums.map(_.toDouble / n.toDouble))))
  }

  /** Block-table format version; bumped when the [[PostingBlocks.Block]]
    * schema OR on-disk layout changes (v2: per-field `min_fl` metadata for
    * the tight BM25 bound; v3: `(bucket, rg)` hive partitioning with
    * `rg = block_id / rangesPerGroup` — the unit of INCREMENTAL block
    * maintenance and of partition pruning for WAND probe/survivor decodes).
    * Stale-format persisted blocks are rebuilt by [[buildBlocks]] and
    * refused by [[readBlocks]].
    */
  val BlockFormat = "3"

  /** Doc-id ranges per block-table partition dir — the granularity of
    * incremental rewrite: an append/vacuum re-encodes only the
    * `(bucket, rg)` dirs its doc-id ranges touch and leaves every other
    * block file byte-identical. Default 32 ranges × 4096-doc blocks =
    * 128k docs per rg; at deployment scale tune blockSize × rangesPerGroup
    * together so each (bucket, rg) parquet file lands near the 100-500 MB
    * sweet spot.
    */
  val DefaultRangesPerGroup: Long = 32L

  /** Exact integer division on long columns. Spark's `/` is DOUBLE
    * division — a doc_id/block_id above 2^53 would lose low bits in the
    * double round-trip BEFORE the truncating cast, silently mapping docs
    * to the wrong block/rg (and the incremental fold would then swap a
    * partial rewrite over a live partition it never decoded). Minted
    * 64-bit ids make that range reachable, so every Spark-side id→block
    * and block→rg mapping goes through IntegralDivide, matching
    * [[PostingBlocks.fromPostings]]'s exact JVM long division.
    */
  private def longDiv(a: org.apache.spark.sql.Column, b: Long) = {
    import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
    toColumn(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      toExpression(a.cast("long")), toExpression(lit(b))))
  }

  /** rg stays an INT partition value, capping doc_id at
    * blockSize·rangesPerGroup·2^31 (3.5×10^13 at the defaults, far above
    * the 10^12 design point; tuned layouts raise it further). Beyond the
    * cap the ANSI cast fails LOUDLY — never the silent wrong-partition
    * mapping the pre-review double division had above 2^53.
    */
  private def rgCol(blockId: org.apache.spark.sql.Column, rpg: Long) =
    longDiv(blockId, rpg).cast("int")

  /** Optional compressed-block stage (resumable like the rest): posting
    * blocks with block-max metadata for [[graft.query.BlockMaxTopK]],
    * partitioned by (term bucket, doc-id range group).
    *
    * Re-invoking after an [[addDocuments]] append folds the pending delta
    * generations in INCREMENTALLY ([[foldAppendDeltas]]) — O(delta), not a
    * rebuild from the full posting store. `blockSize`/`rangesPerGroup`
    * apply to a FULL (re)build only; incremental folds always use the
    * manifest's recorded config.
    */
  def buildBlocks(spark: SparkSession, root: String,
      blockSize: Long = PostingBlocks.DefaultBlockSize,
      rangesPerGroup: Long = DefaultRangesPerGroup): Unit = {
    var m = readManifest(spark, root)
    require(m.getOrElse("published", "") == "true", s"no published index at $root")
    if (m.contains("stage.blocks.rows")) {
      if (m.getOrElse("config.blockFormat", "1") == BlockFormat) {
        // current-format table: fold pending append deltas (O(delta)), or
        // nothing to do
        if (m.getOrElse("blocks.pending", "").nonEmpty || m.contains("blocks.swap"))
          foldAppendDeltas(spark, root)
        return
      }
      // stale on-disk format: drop and rebuild (with any fold leftovers)
      fs(spark, root).delete(new Path(s"$root/blocks"), true)
      fs(spark, root).delete(new Path(s"$root/$BlockFoldTmp"), true)
      m = m -- BlockStateKeys
      writeManifest(spark, root, m)
    }
    val nf = m("config.numFields").toInt
    val nb = m("config.nBuckets").toInt
    m = stage(spark, root, "blocks", m, partitionBy = Seq("bucket", "rg")) {
      PostingBlocks.fromPostings(spark.read.parquet(s"$root/postings"), nf, blockSize)
        .toDF().withColumn("bucket", bucketOf(col("term"), nb))
        .withColumn("rg", rgCol(col("block_id"), rangesPerGroup))
        .repartition(nb, col("bucket"))
        .sortWithinPartitions(col("term"), col("block_id"))
    }
    writeManifest(spark, root, m - "blocks.pending" +
      ("config.blockSize" -> blockSize.toString) +
      ("config.blockFormat" -> BlockFormat) +
      ("config.rangesPerGroup" -> rangesPerGroup.toString))
  }

  /** Every manifest key describing block-table state (stripped whenever the
    * dir is dropped, so a phantom stage can never wedge readers/rebuilds).
    */
  private val BlockStateKeys = Seq("stage.blocks.rows", "stage.blocks.secs",
    "blocks.pending", "blocks.swap", "blocks.swap.rows", "blocks.swap.drop",
    "config.blockFormat", "config.blockSize", "config.rangesPerGroup")

  /** Drop the block table and all its manifest state. The next
    * [[buildBlocks]] performs a FULL build with whatever
    * blockSize/rangesPerGroup it is given — the sanctioned path for
    * re-tuning the block layout (an incremental fold always keeps the
    * recorded config, and buildBlocks on a current-format table ignores
    * new layout params). Key-strip commits before the dir delete, so a
    * crash between the two leaves an orphan dir that the next full build
    * overwrites — never a phantom stage.
    */
  def dropBlocks(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    writeManifest(spark, root, readManifest(spark, root) -- BlockStateKeys)
    f.delete(new Path(s"$root/blocks"), true)
    f.delete(new Path(s"$root/$BlockFoldTmp"), true)
    ()
  }

  private val BlockFoldTmp = "_tmp_blocks_fold"

  /** Delta posting files of the given append generations: publishAppend
    * moves staged part-files in under `append_<g>_` names, so the fold can
    * read EXACTLY the delta — an O(delta) listing + read, never a
    * posting-store scan.
    */
  private def listAppendFiles(f: FileSystem, dir: String,
      gens: Set[String]): Seq[String] = {
    val prefixes = gens.map(g => s"append_${g}_")
    val out = Seq.newBuilder[String]
    val d = new Path(dir)
    if (f.exists(d)) f.listStatus(d).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith("bucket="))
        f.listStatus(st.getPath).foreach { fl =>
          val n = fl.getPath.getName
          if (fl.isFile && prefixes.exists(n.startsWith)) out += fl.getPath.toString
        }
    }
    out.result()
  }

  /** Move every `bucket=X/rg=Y` dir under `tmp` into `live`, replacing the
    * existing dir. Idempotent: a partition already swapped is gone from
    * tmp; a crash between delete and rename leaves the tmp copy, which the
    * resume moves. `maxRenames` exists ONLY for fault injection (rename
    * that many partitions and stop — the exact on-disk state a crash in
    * the middle of the loop leaves behind); production callers use the
    * unbounded default, so the fuzzed protocol IS the production protocol.
    * Partitions are visited in sorted order so the fault-injected prefix
    * is deterministic.
    */
  private def swapBlockPartitions(f: FileSystem, tmp: String, live: String,
      maxRenames: Long = Long.MaxValue): Unit = {
    val tp = new Path(tmp)
    if (!f.exists(tp)) return
    var renamed = 0L
    f.listStatus(tp).sortBy(_.getPath.getName).foreach { b =>
      if (b.isDirectory && b.getPath.getName.startsWith("bucket="))
        f.listStatus(b.getPath).sortBy(_.getPath.getName).foreach { r =>
          if (renamed < maxRenames &&
              r.isDirectory && r.getPath.getName.startsWith("rg=")) {
            val dstDir = new Path(s"$live/${b.getPath.getName}")
            f.mkdirs(dstDir)
            val dst = new Path(dstDir, r.getPath.getName)
            f.delete(dst, true)
            f.rename(r.getPath, dst)
            renamed += 1
          }
        }
    }
  }

  /** Incrementally fold pending append generations into the block table:
    * decode ONLY the block rows of the (bucket, rg) partitions the delta
    * postings touch, merge with the delta, re-encode, and swap exactly
    * those partition dirs. Every untouched block file stays byte-identical
    * (asserted by IncrementalBlockSpec). With fresh (monotone) appended
    * doc-ids the touched set is the delta's own new rg dirs plus at most
    * one boundary rg per bucket — O(delta), where the round-4 engine paid
    * an O(corpus) re-encode from the full posting store per mutation.
    *
    * Crash protocol: rebuilt partitions are FULLY written under
    * `_tmp_blocks_fold` before `blocks.swap` is committed; the swap
    * (delete live dir, move tmp dir in, per partition) runs only with the
    * marker set and resumes by moving whatever is left in tmp;
    * `blocks.pending` is trimmed only in the final commit, so a crash at
    * any point re-enters the right phase. Single-writer assumption as for
    * all mutations (see [[addDocuments]]).
    */
  private def foldAppendDeltas(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val tmp = s"$root/$BlockFoldTmp"
    var m = readManifest(spark, root)
    while (m.contains("blocks.swap") ||
        m.getOrElse("blocks.pending", "").nonEmpty) {
      if (!m.contains("blocks.swap")) {
        val gens = m("blocks.pending").split(",").filter(_.nonEmpty).toSeq
        val nf = m("config.numFields").toInt
        val nb = m("config.nBuckets").toInt
        val bs = m("config.blockSize").toLong
        val rpg = m("config.rangesPerGroup").toLong
        val deltaFiles = listAppendFiles(f, s"$root/postings", gens.toSet)
        if (deltaFiles.isEmpty) { // empty delta (e.g. all-empty docs)
          writeManifest(spark, root, m - "blocks.pending"); return
        }
        // basePath keeps the hive `bucket` partition column on the
        // explicit file list
        val delta = spark.read.option("basePath", s"$root/postings")
          .parquet(deltaFiles: _*)
          .withColumn("block_id", longDiv(col("doc_id"), bs))
          .withColumn("rg", rgCol(col("block_id"), rpg))
        val pairs = delta.select(col("bucket"), col("rg")).distinct()
          .collect().map(r => (r.getInt(0), r.getInt(1)))
        val bks = pairs.map(_._1).distinct.toSeq
        val rgs = pairs.map(_._2).distinct.toSeq
        val pairKeys = pairs.map { case (b, r) => s"$b:$r" }.toSeq
        // bucket/rg IN (…) partition-prunes the scan; the exact pair
        // filter keeps cartesian-extra partitions out of the rewrite
        val old = spark.read.parquet(s"$root/blocks")
          .filter(col("bucket").isin(bks: _*) && col("rg").isin(rgs: _*) &&
            concat_ws(":", col("bucket"), col("rg")).isin(pairKeys: _*))
          .cache()
        val oldCnt = old.count()
        val merged = PostingBlocks.toPostings(old, nf, bs)
          .unionByName(delta.select("term", "doc_id", "tf", "fl", "occ"))
          // defense-in-depth idempotency: a doc's postings are written by
          // exactly one generation, so any old∩delta overlap is row-equal
          .dropDuplicates("term", "doc_id")
        val fresh = PostingBlocks.fromPostings(merged, nf, bs)
          .toDF().withColumn("bucket", bucketOf(col("term"), nb))
          .withColumn("rg", rgCol(col("block_id"), rpg))
          .repartition(col("bucket"), col("rg"))
          .sortWithinPartitions(col("term"), col("block_id"))
        f.delete(new Path(tmp), true)
        val obs = org.apache.spark.sql.Observation()
        fresh.observe(obs, count(lit(1)).as("rows"))
          .write.partitionBy("bucket", "rg").parquet(tmp)
        val newCnt = obs.get("rows").asInstanceOf[Long]
        old.unpersist()
        val total = m("stage.blocks.rows").toLong - oldCnt + newCnt
        m = readManifest(spark, root) +
          ("blocks.swap" -> gens.mkString(",")) +
          ("blocks.swap.rows" -> total.toString)
        writeManifest(spark, root, m)
      }
      // swap phase + final commit: trim exactly the folded generations
      // (another append may have queued more while a crashed swap waited).
      // This loop may also be finishing a VACUUM's crashed block swap
      // (blocks.swap = "vacuum", reachable when a serving job calls
      // buildBlocks before anyone re-runs vacuum): that swap carries a
      // `blocks.swap.drop` list of partitions whose blocks all emptied —
      // apply it here too, or the retired dirs would survive with a stale
      // row count (masked only while the tombstones still exist).
      swapBlockPartitions(f, tmp, s"$root/blocks")
      m = readManifest(spark, root)
      m.getOrElse("blocks.swap.drop", "").split(";").filter(_.nonEmpty)
        .foreach(rel => f.delete(new Path(s"$root/blocks/$rel"), true))
      val folded = m("blocks.swap").split(",").toSet
      val remaining = m.getOrElse("blocks.pending", "").split(",")
        .filter(g => g.nonEmpty && !folded.contains(g))
      val base = m - "blocks.swap" - "blocks.swap.rows" - "blocks.swap.drop" +
        ("stage.blocks.rows" ->
          m.getOrElse("blocks.swap.rows", m("stage.blocks.rows")))
      writeManifest(spark, root,
        if (remaining.isEmpty) base - "blocks.pending"
        else base + ("blocks.pending" -> remaining.mkString(",")))
      f.delete(new Path(tmp), true)
      m = readManifest(spark, root)
    }
  }

  def readBlocks(spark: SparkSession, root: String): (org.apache.spark.sql.Dataset[PostingBlocks.Block], Long, Long) = {
    import spark.implicits._
    val m = readManifest(spark, root)
    // the stage key is cleared whenever the dir is dropped; a dir without
    // the key must not be served
    require(m.contains("stage.blocks.rows"),
      s"no current block stage at $root — run buildBlocks after build/vacuum/append")
    require(m.getOrElse("config.blockFormat", "1") == BlockFormat,
      s"block table at $root has format ${m.getOrElse("config.blockFormat", "1")}, " +
        s"engine expects $BlockFormat — re-run buildBlocks")
    // appended generations not yet folded in (or a mid-swap fold) mean the
    // table is missing live postings — refuse rather than serve partial
    // results; buildBlocks folds them in O(delta)
    require(m.getOrElse("blocks.pending", "").isEmpty && !m.contains("blocks.swap"),
      s"block table at $root has unfolded append deltas " +
        s"(${m.get("blocks.pending").filter(_.nonEmpty)
          .getOrElse("swap in progress")}) — re-run buildBlocks")
    val bs = m.getOrElse("config.blockSize", PostingBlocks.DefaultBlockSize.toString).toLong
    val rpg = m.getOrElse("config.rangesPerGroup", DefaultRangesPerGroup.toString).toLong
    // KEEP the bucket/rg partition columns (the Block encoder tolerates
    // extra fields): BlockMaxTopK prunes the metadata scan to the expanded
    // terms' buckets and the probe/survivor decodes to their rg dirs —
    // without them every WAND query reads the whole block store
    (spark.read.parquet(s"$root/blocks").as[PostingBlocks.Block], bs, rpg)
  }

  /** Incrementally compact the block table for a vacuum: re-encode only
    * the (bucket, rg) partitions containing tombstoned doc-ids — decode,
    * anti-join the tombstone set, re-encode, swap those dirs; every other
    * block file is untouched. Runs BEFORE the vacuum's final commit
    * (tombstones still on disk) and is idempotent under crash-resume:
    * re-decoding an already-compacted partition and anti-joining the same
    * tombstones is a fixpoint.
    */
  /** Returns false ONLY under `crashMidSwap` fault injection (the caller
    * then aborts the vacuum as a simulated crash after one partition
    * rename with the swap marker still set).
    */
  private def compactBlocks(spark: SparkSession, root: String,
      crashMidSwap: Boolean = false): Boolean = {
    val f = fs(spark, root)
    val tmp = s"$root/$BlockFoldTmp"
    var m = readManifest(spark, root)
    if (!f.exists(new Path(s"$root/tombstones")) && !m.contains("blocks.swap"))
      return true
    if (!m.contains("blocks.swap")) {
      val nf = m("config.numFields").toInt
      val nb = m("config.nBuckets").toInt
      val bs = m("config.blockSize").toLong
      val rpg = m("config.rangesPerGroup").toLong
      val tombs = spark.read.parquet(s"$root/tombstones").select(col("doc_id"))
      val rgs = tombs.select(rgCol(longDiv(col("doc_id"), bs), rpg)
        .as("rg")).distinct().collect().map(_.getInt(0)).toSeq
      if (rgs.isEmpty) return true
      val old = spark.read.parquet(s"$root/blocks")
        .filter(col("rg").isin(rgs: _*)).cache()
      val oldPairs = old.select(col("bucket"), col("rg")).distinct().collect()
        .map(r => s"bucket=${r.getInt(0)}/rg=${r.getInt(1)}")
      if (oldPairs.isEmpty) { old.unpersist(); return true }
      val oldCnt = old.count()
      val live = PostingBlocks.toPostings(old, nf, bs)
        .join(tombs, Seq("doc_id"), "left_anti")
      val fresh = PostingBlocks.fromPostings(live, nf, bs)
        .toDF().withColumn("bucket", bucketOf(col("term"), nb))
        .withColumn("rg", rgCol(col("block_id"), rpg))
        .repartition(col("bucket"), col("rg"))
        .sortWithinPartitions(col("term"), col("block_id"))
      f.delete(new Path(tmp), true)
      val obs = org.apache.spark.sql.Observation()
      fresh.observe(obs, count(lit(1)).as("rows"))
        .write.partitionBy("bucket", "rg").parquet(tmp)
      val newCnt = obs.get("rows").asInstanceOf[Long]
      old.unpersist()
      val total = m("stage.blocks.rows").toLong - oldCnt + newCnt
      // the explicit drop list covers ONLY partitions whose blocks all
      // emptied (no tmp counterpart exists to replace them). It must NOT
      // include rewritten pairs: the swap below renames each tmp dir away
      // as it lands, so a crash mid-swap + resume would re-delete an
      // already-swapped live dir with its tmp copy gone — permanent block
      // loss (the pre-round-5-review code did exactly that; pinned by
      // LifecycleProps' mid-swap crash fuzz)
      val freshPairs = (for {
        b <- f.listStatus(new Path(tmp)).toSeq
        if b.isDirectory && b.getPath.getName.startsWith("bucket=")
        r <- f.listStatus(b.getPath).toSeq
        if r.isDirectory && r.getPath.getName.startsWith("rg=")
      } yield s"${b.getPath.getName}/${r.getPath.getName}").toSet
      m = readManifest(spark, root) + ("blocks.swap" -> "vacuum") +
        ("blocks.swap.rows" -> total.toString) +
        ("blocks.swap.drop" -> oldPairs.filterNot(freshPairs).mkString(";"))
      writeManifest(spark, root, m)
    }
    m = readManifest(spark, root)
    if (crashMidSwap) { // fault injection: die after ONE partition rename
      swapBlockPartitions(f, tmp, s"$root/blocks", maxRenames = 1)
      return false
    }
    // SWAP first (each rename replaces the stale live dir), THEN the
    // emptied-pair drops, THEN the commit: every step re-runs cleanly from
    // any crash point — a swapped pair's tmp absence makes the swap a
    // no-op, a dropped pair never has fresh data, and the commit is last
    swapBlockPartitions(f, tmp, s"$root/blocks")
    m.getOrElse("blocks.swap.drop", "").split(";").filter(_.nonEmpty)
      .foreach(rel => f.delete(new Path(s"$root/blocks/$rel"), true))
    writeManifest(spark, root,
      readManifest(spark, root) - "blocks.swap" - "blocks.swap.drop" -
        "blocks.swap.rows" +
        ("stage.blocks.rows" -> m("blocks.swap.rows")))
    f.delete(new Path(tmp), true)
    true
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
    *
    * SINGLE WRITER: all mutations (`addDocuments` / `removeDocuments` /
    * `vacuum`) assume one writer at a time per index root — the crash
    * protocol makes any PREFIX of a mutation resumable, but two writers
    * interleaving check-then-act guards can interleave stage dirs and
    * generation numbers. Readers are unrestricted. A deployment with
    * concurrent writers must serialize them externally (the
    * Iceberg-catalog binding this layout is shaped for does it with
    * optimistic commit retries). The one cross-writer hazard with a safe
    * in-engine answer — a remove landing between a running vacuum's stage
    * rewrites and its commit — is closed structurally: vacuum retires only
    * the tombstone FILES it snapshotted at stage time, so a late tombstone
    * survives the commit as a correct mask (see [[vacuum]]).
    */
  def addDocuments(docs: DataFrame, docIdCol: String, root: String,
      compactDeltasEvery: Int = 8): InvertedIndex = {
    val spark = docs.sparkSession
    resumeAppend(spark, root) // finish any interrupted predecessor first
    val g = stageAppend(docs, docIdCol, root, compactDeltasEvery)
    publishAppend(spark, root, g)
    read(spark, root)
  }

  /** Phase 1 only (STAGE): writes the four staged outputs and records
    * `append.staged` — the published index is untouched until
    * [[publishAppend]]. Exposed for the crash-resume test, which
    * "crashes" here and recovers via [[resumeAppend]]. `extra` entries
    * ride the stage-commit manifest write (the streaming ingester's
    * `stream.stagedBatch` marker — committed atomically with the stage so
    * a replayed micro-batch can recognize its own crashed attempt; see
    * [[graft.streaming.StreamingIndexer.applyBatch]]).
    */
  private[graft] def stageAppend(docs: DataFrame, docIdCol: String,
      root: String, compactDeltasEvery: Int = 8,
      extra: Map[String, String] = Map.empty): Int = {
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
    // dictionary/stats: a DELTA table covering only this generation's docs
    // (O(delta-vocab) — a streaming micro-batch's stage cost no longer
    // scales with the corpus vocabulary), rolled up into one merged base
    // every `compactDeltasEvery` generations so the reader-side union stays
    // bounded. The reader is [[termdictDf]]/[[fieldstatsRow]].
    val kind = if (deltaGens(m).size + 1 >= compactDeltasEvery) "rollup" else "delta"
    val aggs = count(lit(1)).as("n") +:
      (0 until nf).map(i => coalesce(sum(element_at(col("fl"), i + 1)), lit(0L)).as(s"s$i"))
    if (kind == "delta") {
      spark.read.parquet(s"$stageDir/postings")
        .groupBy(col("term")).agg(sum(col("occ")).as("df"))
        .withColumn("bucket", bucketOf(col("term"), nb))
        .write.parquet(s"$stageDir/termdict")
      spark.read.parquet(s"$stageDir/docstats")
        .agg(aggs.head, aggs.tail: _*)
        .write.parquet(s"$stageDir/fieldstats")
    } else {
      termdictDf(spark, root, m)
        .select(col("term"), col("df"))
        .union(spark.read.parquet(s"$stageDir/postings")
          .groupBy(col("term")).agg(sum(col("occ")).as("df")))
        .groupBy(col("term")).agg(sum(col("df")).as("df"))
        .withColumn("bucket", bucketOf(col("term"), nb))
        .write.parquet(s"$stageDir/termdict")
      // the live docstats dir already holds every prior generation's rows
      // (publishAppend moves them in), so a full re-aggregate is exact
      spark.read.parquet(s"$root/docstats")
        .union(spark.read.parquet(s"$stageDir/docstats"))
        .agg(aggs.head, aggs.tail: _*)
        .write.parquet(s"$stageDir/fieldstats")
    }
    // per-bucket lineage of the DELTA, recorded at stage time: appends must
    // not rescan the whole posting store per publish (at streaming-ingest
    // rates that is an O(corpus) metadata pass per micro-batch), so the
    // global `lineage.postings` stays as-of the last build/vacuum and each
    // append adds its own delta line.
    val deltaPerBucket = spark.read.parquet(s"$stageDir/postings")
      .groupBy("bucket").count().orderBy("bucket").collect()
      .map(r => s"${r.getInt(0)}=${r.getLong(1)}").mkString(";")
    writeManifest(spark, root, readManifest(spark, root) ++ extra +
      ("append.staged" -> g.toString) +
      ("append.staged.kind" -> kind) +
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
    * crash at any point completes the remainder. A `stream.stagedBatch`
    * marker left by [[graft.streaming.StreamingIndexer]] is promoted to
    * `stream.lastBatch` IN the commit write — publish and batch-applied
    * are one atomic manifest transition, whichever code path finishes a
    * crashed append.
    */
  private[graft] def publishAppend(spark: SparkSession, root: String, g: Int): Unit = {
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

    // promote the small staged tables into GENERATION-NAMED dirs — delta
    // appends to `<table>.d<g>` (the base stays live; readers union it
    // with the deltas), rollups to `<table>.g<g>` (the repoint below
    // retires base + deltas). The live tables are never renamed away —
    // the single manifest write repoints atomically, so a crash anywhere
    // leaves the index readable (old manifest → old dirs, still intact).
    // Skip when the staged copy is gone AND the generation dir exists
    // (already promoted by a previous attempt).
    var m = readManifest(spark, root)
    // legacy default "rollup" keeps the pre-delta full-merge semantics for
    // stages written by an older engine version
    val kind = m.getOrElse("append.staged.kind", "rollup")
    val gdir = if (kind == "delta") s"d$g" else s"g$g"
    def promote(table: String): Unit = {
      val staged = new Path(s"$stageDir/$table")
      val dst = new Path(s"$root/$table.$gdir")
      if (f.exists(staged)) {
        f.delete(dst, true) // partial promote from a crashed attempt
        f.rename(staged, dst)
      }
      require(f.exists(dst), s"append $g: neither staged nor promoted $table")
      ()
    }
    promote("termdict")
    promote("fieldstats")

    // commit: ONE manifest write bumps the generation, registers the delta
    // (or repoints both small tables on a rollup), clears the pending
    // marker (the delta's per-bucket lineage was recorded at stage time —
    // no O(corpus) rescan here), and marks any block stage as PENDING this
    // generation: the table stays live for readers of the pre-append
    // manifest, and the next buildBlocks folds the delta in O(delta)
    // (foldAppendDeltas) instead of rebuilding from the full posting store
    m = readManifest(spark, root)
    val promoted = promoteStreamMarker(m)
    var commit = promoted - "append.staged" - "append.staged.kind" +
      ("append.gen" -> g.toString)
    commit =
      if (kind == "delta")
        commit + ("append.deltas" -> (deltaGens(m) :+ g.toString).mkString(","))
      else
        commit - "append.deltas" +
          ("table.termdict" -> s"termdict.g$g") +
          ("table.fieldstats" -> s"fieldstats.g$g")
    if (m.contains("stage.blocks.rows")) {
      val p = m.getOrElse("blocks.pending", "")
      commit += ("blocks.pending" ->
        (if (p.isEmpty) g.toString else s"$p,$g"))
    }
    writeManifest(spark, root, commit)

    // post-commit garbage collection (all idempotent; readers holding the
    // OLD manifest race this — the same already-published-read lag shape
    // as the delta posting files above). A delta append retires nothing;
    // a rollup retires the old base and every folded delta dir.
    if (kind != "delta") {
      def gcOldGens(table: String): Unit =
        f.listStatus(new Path(root)).foreach { st =>
          val n = st.getPath.getName
          if (st.isDirectory &&
              (n == table || n.startsWith(s"$table.d") ||
                (n.startsWith(s"$table.g") && n != s"$table.g$g")))
            f.delete(st.getPath, true)
        }
      gcOldGens("termdict")
      gcOldGens("fieldstats")
    }
    f.delete(new Path(stageDir), true)
    ()
  }

  /** PERSISTED SHARD MERGE — combine independently built index roots into
    * one queryable root WITHOUT re-tokenizing, re-aggregating, or shuffling
    * any corpus-sized data. The 100-TB build topology made durable: shards
    * are built in parallel (each a bounded resumable [[build]] over its own
    * corpus slice, possibly on a different cluster), then merged here.
    *
    * Why it's cheap: every shard's posting store is hive-partitioned by
    * the SAME term-hash bucket ([[bucketOf]]), so merging postings (and
    * docstats/tombstones) is placing both shards' parquet files under the
    * shared partition dirs — O(#files) filesystem copies (renames on a
    * production cluster FS), zero compute over postings. The only COMPUTED
    * artifacts are the merged term dictionary (a vocab-sized `sum(df)`
    * union — df is the occurrence count, additive across shards) and the
    * one-row fieldstats fold. Shard append deltas are resolved through the
    * same readers queries use ([[termdictDf]]/[[fieldstatsRow]]), so the
    * output always carries a COMPACT dictionary with no delta chain.
    *
    * The block table is NOT merged: shard doc-id ranges may interleave
    * (two shards' `(bucket, rg)` dirs would collide with different doc
    * subsets), so the merged root starts blockless and [[buildBlocks]]
    * rebuilds on demand. Deployments that mint disjoint per-shard doc-id
    * RANGES can lift the shard block files verbatim — the same argument as
    * the incremental append fold — left as the documented optimization.
    *
    * Crash-safe and resumable like [[build]]: `merge.sources` pins the
    * input set first, each shard's file copy commits a `merge.copied.<i>`
    * key (copies are overwrite-idempotent under deterministic `s<i>-`
    * names), termdict/fieldstats ride the standard [[stage]] protocol, and
    * `published` is the final commit. Re-invoking after a crash at ANY
    * point resumes; re-invoking after completion is a no-op read.
    *
    * Caller contract: shards published, not mid-vacuum, same field layout
    * + tokenizer + bucket count, disjoint doc_id sets, `out` empty or a
    * prior attempt over the SAME sources.
    */
  def mergeShards(spark: SparkSession, shards: Seq[String],
      out: String): InvertedIndex = {
    require(shards.size >= 2, "need at least two shards")
    val ms = shards.map(r => readManifest(spark, r))
    ms.zip(shards).foreach { case (m, r) =>
      require(m.getOrElse("published", "") == "true", s"shard not published: $r")
      require(m.getOrElse("vacuum.pending", "") != "true",
        s"shard mid-vacuum (finish it first): $r")
    }
    val nf = ms.head("config.numFields")
    val fields = ms.head("config.fields")
    val nBuckets = ms.head("config.nBuckets")
    ms.zip(shards).foreach { case (m, r) =>
      require(m("config.numFields") == nf && m("config.fields") == fields &&
        m("config.nBuckets") == nBuckets,
        s"shard config mismatch at $r (fields/buckets must agree)")
    }
    var mo = readManifest(spark, out)
    if (mo.getOrElse("published", "") == "true") {
      require(mo.getOrElse("merge.sources", "") == shards.mkString(","),
        s"$out already holds a different index")
      return read(spark, out)
    }
    if (!mo.contains("merge.sources")) {
      mo = mo + ("merge.sources" -> shards.mkString(","))
      writeManifest(spark, out, mo)
    } else require(mo("merge.sources") == shards.mkString(","),
      s"$out holds a pending merge of different sources")
    val f = fs(spark, out)
    val conf = spark.sparkContext.hadoopConfiguration

    // 1. file-level union of the corpus-sized tables. Deterministic
    // target names (s<i>- prefix keeps shard files distinct under the
    // shared partition dir) make a resumed copy overwrite its own partial
    // output instead of duplicating rows.
    shards.zipWithIndex.foreach { case (r, i) =>
      if (!mo.contains(s"merge.copied.$i")) {
        for (table <- Seq("postings", "docstats", "tombstones")) {
          val src = new Path(s"$r/$table")
          val sf = fs(spark, r)
          if (sf.exists(src)) {
            val it = sf.listFiles(src, true)
            while (it.hasNext) {
              val st = it.next()
              if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
                val rel = st.getPath.toString.stripPrefix(
                  sf.makeQualified(src).toString).stripPrefix("/")
                val dir = rel.lastIndexOf('/') match {
                  case -1 => ""
                  case k  => rel.substring(0, k + 1)
                }
                val dst = new Path(
                  s"$out/$table/${dir}s$i-${st.getPath.getName}")
                org.apache.hadoop.fs.FileUtil.copy(sf, st.getPath, f, dst,
                  false, true, conf)
              }
            }
          }
        }
        mo = mo + (s"merge.copied.$i" -> "true")
        writeManifest(spark, out, mo)
      }
    }

    // 2. merged dictionary: vocab-sized, delta-resolved per shard, df
    // summed per (term, bucket), term-range-sorted like build's
    mo = stage(spark, out, "termdict", mo) {
      shards.zip(ms).map { case (r, m) => termdictDf(spark, r, m) }
        .reduce(_.unionByName(_))
        .groupBy(col("term"), col("bucket")).agg(sum(col("df")).as("df"))
        .repartitionByRange(col("term"))
        .sortWithinPartitions(col("term"))
    }
    // 3. fieldstats: one-row arithmetic fold of the shards' (delta-resolved)
    // stats rows — additive by construction
    mo = stage(spark, out, "fieldstats", mo) {
      val nfi = nf.toInt
      val rows = shards.zip(ms).map { case (r, m) =>
        fieldstatsRow(spark, r, m, nfi)
      }
      val n = rows.map(_.getLong(0)).sum
      val cols = lit(n).as("n") +: (0 until nfi).map(i =>
        lit(rows.map(_.getLong(i + 1)).sum).as(s"s$i"))
      spark.range(1).select(cols: _*)
    }

    // 4. lineage + config + publish. Per-bucket lineage is the sum of the
    // shards' counts (the same invariant build records). A shard's total
    // is its base `lineage.postings` PLUS every `lineage.append.<g>`
    // delta line — appended generations' files were moved into postings/
    // at publish, so their rows are in the copied store and must be in
    // the folded lineage (vacuum folds deltas back into the base, so no
    // double count is possible).
    if (mo.getOrElse("published", "") != "true") {
      val perBucket = ms.flatMap(m =>
        m.collect { case (k, v)
            if k == "lineage.postings" || k.startsWith("lineage.append.") =>
          v }
          .flatMap(_.split(";").filter(_.nonEmpty))
          .map { kv => val Array(b, c) = kv.split("="); (b.toInt, c.toLong) })
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
        .map { case (b, c) => s"$b=$c" }.mkString(";")
      mo = mo + ("lineage.postings" -> perBucket) +
        ("config.nBuckets" -> nBuckets) +
        ("config.numFields" -> nf) +
        ("config.fields" -> fields) +
        ("published" -> "true")
      writeManifest(spark, out, mo)
    }
    read(spark, out)
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

  // ---- fuzzy expansion at scale: the deletion-variant table ----

  /** `{s} ∪ {s with character i deleted}` as a Spark column — the
    * symmetric-delete neighborhood for maxEdits = 1. Character-based
    * (`substring`/`length` count code points), matching Spark's
    * `levenshtein`. MUST stay definitionally identical to
    * [[deletionVariantsDriver]] (asserted by FuzzySpec): the query side
    * generates its variants on the driver, the dictionary side here, and a
    * mismatch silently loses candidates.
    */
  private[graft] def deletionVariantsCol(term: org.apache.spark.sql.Column) =
    // greatest(…, 0): a zero-length term (unreachable — the tokenizer drops
    // empties — but sequence(0, -1) would DESCEND into [0, -1]) degrades to
    // the identity variant instead of corrupt substrings
    array_distinct(concat(
      array(term),
      transform(sequence(lit(0), greatest(length(term) - 1, lit(0))), i =>
        concat(term.substr(lit(1), i), term.substr(i + lit(2), lit(Int.MaxValue))))))

  /** Driver-side mirror of [[deletionVariantsCol]] for the query term. */
  private[graft] def deletionVariantsDriver(term: String): Seq[String] =
    (term +: term.indices.map(i => term.substring(0, i) + term.substring(i + 1))).distinct

  /** Build the persisted deletion-variant table (`fuzzydict/`) for
    * fuzzy (Levenshtein ≤ 1) term expansion at scale — the SymSpell
    * observation: `lev(a,b) ≤ 1 ⇔ D₁(a) ∩ D₁(b) ≠ ∅` where
    * `D₁(x) = {x} ∪ {x minus one character}`. Each BASE-dictionary term is
    * stored once per variant, hive-partitioned by `vbucket =
    * pmod(xxhash64(variant), nBuckets)`; a query then probes `O(len(q))`
    * variants with `vbucket IN (…) AND variant IN (…)` — partition-pruned
    * point lookups — instead of running `levenshtein` across the whole
    * vocabulary (O(vocab) per query, the brute path
    * [[graft.query.QueryEngine.query]] uses without this table).
    *
    * Coverage protocol (NO per-append maintenance cost): the table covers
    * the BASE dictionary generation it was built from (`fuzzy.base`).
    * Append DELTAS are not folded in — [[fuzzyCandidateDict]] brute-scans
    * the ≤G small delta dictionaries per query (O(delta-vocab), the same
    * cost shape as the delta-dictionary reads themselves). A ROLLUP or
    * vacuum retires the base generation; the next [[fuzzyCandidateDict]]
    * then refuses until buildFuzzy is re-run (dictionary-sized, not
    * corpus-sized). Resumable like every stage; idempotent when current.
    */
  def buildFuzzy(spark: SparkSession, root: String): Unit = {
    var m = readManifest(spark, root)
    require(m.getOrElse("published", "") == "true", s"no published index at $root")
    val base = tableDir(m, "termdict")
    if (m.contains("stage.fuzzydict.rows")) {
      if (m.getOrElse("fuzzy.base", "") == base) return // current
      // stale (base dictionary rolled up / vacuumed): strip keys and
      // rebuild — key-strip commits first so a crash never leaves a
      // phantom stage over a half-rebuilt dir
      writeManifest(spark, root,
        m -- Seq("stage.fuzzydict.rows", "stage.fuzzydict.secs", "fuzzy.base"))
      fs(spark, root).delete(new Path(s"$root/fuzzydict"), true)
      m = readManifest(spark, root)
    }
    val nb = m("config.nBuckets").toInt
    m = stage(spark, root, "fuzzydict", m, partitionBy = Seq("vbucket")) {
      spark.read.parquet(s"$root/$base")
        .select(col("term")).distinct()
        .select(col("term"), explode(deletionVariantsCol(col("term"))).as("variant"))
        .withColumn("vbucket", bucketOf(col("variant"), nb))
        .repartition(nb, col("vbucket"))
        .sortWithinPartitions(col("variant"), col("term"))
    }
    writeManifest(spark, root, m + ("fuzzy.base" -> base))
  }

  /** Pruned live-dictionary view for fuzzy resolution: rows
    * `(term, df, bucket)` covering a SUPERSET of the dictionary terms
    * within `maxEdits` edits of any query term (the resolver verifies with
    * `levenshtein` — this view only prunes). Base vocabulary via the
    * variant table (partition-pruned point lookups); append-delta
    * vocabulary via an O(delta) scan of the small delta dictionaries. The
    * returned plan filters [[termdictDf]] (the live view), so df is always
    * the correct base+delta sum. Falls back to a length-window full-dict
    * view if the candidate set exceeds `cap` (pathological only —
    * candidates are bounded by the query terms' variant-bucket sizes).
    */
  private[graft] def fuzzyCandidateDict(spark: SparkSession, root: String,
      qterms: Seq[String], maxEdits: Int, cap: Int = 4096): DataFrame = {
    import spark.implicits._
    require(maxEdits == 1,
      s"the persisted variant table covers maxEdits = 1 (got $maxEdits); " +
        "use the brute dictionary path for larger radii")
    val m = readManifest(spark, root)
    require(m.contains("stage.fuzzydict.rows"),
      s"no fuzzy variant table at $root — run IndexCatalog.buildFuzzy")
    require(m.getOrElse("fuzzy.base", "") == tableDir(m, "termdict"),
      s"fuzzy variant table at $root was built against a retired base " +
        "dictionary generation — re-run IndexCatalog.buildFuzzy")
    val nb = m("config.nBuckets").toInt
    val live = termdictDf(spark, root, m)

    val qvars = qterms.flatMap(deletionVariantsDriver).distinct
    // variant → vbucket via one LOCAL-relation job (xxhash64 must be
    // Spark's own — never reimplemented driver-side)
    val vbs = qvars.toDF("variant")
      .select(bucketOf(col("variant"), nb).as("vb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val probed = spark.read.parquet(s"$root/fuzzydict")
      .filter(col("vbucket").isin(vbs: _*) && col("variant").isin(qvars: _*))
      .select(col("term")).distinct()
      .limit(cap + 1).collect().map(_.getString(0))
    val lenWindow = qterms.map(t =>
      length(col("term")).between(t.length - maxEdits, t.length + maxEdits))
      .reduce(_ || _)
    if (probed.length > cap) return live.filter(lenWindow) // graceful fallback
    // delta-dictionary vocabulary (appended after the fuzzy build): tiny
    // tables, scanned with the length prefilter only — the resolver's
    // levenshtein verification handles precision
    val gs = deltaGens(m)
    val deltaTerms =
      if (gs.isEmpty) Array.empty[String]
      else gs.map(g => spark.read.parquet(s"$root/termdict.d$g"))
        .reduce(_.unionByName(_))
        .filter(lenWindow).select(col("term")).distinct()
        .limit(cap + 1).collect().map(_.getString(0))
    if (deltaTerms.length > cap) return live.filter(lenWindow)
    val candSet = (probed ++ deltaTerms).distinct.toSeq
    live.filter(col("term").isin(candSet: _*))
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
      crashBeforeCommit: Boolean, crashMidBlockSwap: Boolean = false): Unit = {
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
    val tombDir = new Path(s"$root/tombstones")
    if (!f.exists(tombDir) && !pending) return
    // SNAPSHOT the tombstone files this vacuum will retire (recorded in the
    // manifest so a crash-resume retires the same set): the final commit
    // deletes exactly these files, so a tombstone appended by another
    // writer DURING the vacuum survives as a correct no-op-or-live mask
    // instead of being silently dropped with its postings intact (the
    // check-then-act race the API-level vacuum.pending guard cannot close
    // for out-of-band writers)
    // None ⇔ resuming a LEGACY pending vacuum (crashed under an engine
    // version that never wrote the snapshot key) — the retire step then
    // keeps the old whole-dir delete. Writing "" instead would make that
    // fallback unreachable: zero files retired, dir kept, tombstones mask
    // already-purged docs forever.
    val tombSnapshot: Option[String] =
      if (!pending)
        Some(if (f.exists(tombDir))
          f.listStatus(tombDir).filter(_.isFile).map(_.getPath.getName).mkString(";")
        else "")
      else mPre.get("vacuum.tombfiles")
    val idx = read(spark, root)
    var m = mPre
    // Block-table strategy: a CURRENT-format table with no unfolded append
    // deltas is compacted INCREMENTALLY after the stage rewrites — only
    // the rg partitions containing tombstoned ids are re-encoded
    // (compactBlocks) and its stage keys survive the vacuum. Anything else
    // (no blocks, stale format, unfolded deltas, crashed append-fold) is
    // dropped here WITH all its state keys stripped in the SAME manifest
    // write — deleting the dir while leaving the keys would wedge
    // readBlocks/buildBlocks on a phantom stage.
    val blocksIncremental = m.contains("stage.blocks.rows") &&
      m.getOrElse("config.blockFormat", "1") == BlockFormat &&
      m.getOrElse("blocks.pending", "").isEmpty &&
      (!m.contains("blocks.swap") || m("blocks.swap") == "vacuum")
    // clear stage/lineage keys so the rewrites run (on RESUME keep them —
    // completed stages skip), but KEEP the table.* generation pointers:
    // readers stay on the pre-vacuum termdict/fieldstats (with live
    // tombstone recount, still correct) until the final commit below
    // atomically repoints them at the rewritten tables
    if (!pending)
      m = m -- m.keys.filter(k =>
        (k.startsWith("stage.") && !(blocksIncremental && k.startsWith("stage.blocks"))) ||
          k.startsWith("lineage."))
    if (!blocksIncremental) m = m -- BlockStateKeys
    m = m + ("vacuum.pending" -> "true") ++
      tombSnapshot.map("vacuum.tombfiles" -> _)
    writeManifest(spark, root, m)
    if (!blocksIncremental) {
      // the block table (if built) still holds purged postings and cannot
      // be incrementally maintained from this state: drop it (its state
      // keys were stripped in the commit above)
      f.delete(new Path(s"$root/blocks"), true)
      f.delete(new Path(s"$root/$BlockFoldTmp"), true)
    }
    m = stage(spark, root, "docstats", m)(idx.liveDocstats)
    m = stage(spark, root, "postings", m, partitionBy = Seq("bucket")) {
      val nb = m("config.nBuckets").toInt
      idx.livePostings.repartition(nb, col("bucket"))
        .sortWithinPartitions(col("term"), col("doc_id"))
    }
    m = stage(spark, root, "termdict", m) {
      spark.read.parquet(s"$root/postings")
        .groupBy(col("term"), col("bucket")).agg(sum(col("occ")).as("df"))
        .repartitionByRange(col("term"))
        .sortWithinPartitions(col("term"))
    }
    m = stage(spark, root, "fieldstats", m) {
      val nf = idx.numFields
      val aggs = count(lit(1)).as("n") +:
        (0 until nf).map(i => coalesce(sum(element_at(col("fl"), i + 1)), lit(0L)).as(s"s$i"))
      spark.read.parquet(s"$root/docstats").agg(aggs.head, aggs.tail: _*)
    }
    if (crashBeforeCommit) return // fault injection: die before the commit
    // incremental block compaction (decided above): re-encode only the rg
    // partitions with tombstoned ids, BEFORE the commit deletes the
    // tombstone set it anti-joins. Idempotent under crash-resume.
    if (blocksIncremental) {
      // false ONLY under crashMidBlockSwap fault injection: abort the
      // whole vacuum as a simulated crash one rename into the swap loop
      if (!compactBlocks(spark, root, crashMidBlockSwap)) return
      m = readManifest(spark, root) // picks up the updated stage.blocks.rows
    }
    // vacuum rewrote the whole posting store: refresh the global lineage
    // (append deltas were folded in by the rewrite, so their lines go)
    val perBucket = spark.read.parquet(s"$root/postings")
      .groupBy("bucket").count().orderBy("bucket").collect()
      .map(r => s"${r.getInt(0)}=${r.getLong(1)}").mkString(";")
    // FINAL COMMIT (one manifest write): repoint the small tables at the
    // rewritten plain dirs (drop the table.* generation keys and the
    // append-delta registry — the rewritten dictionary subsumes them),
    // clear the pending marker, publish. Tombstones are deleted only AFTER
    // the commit: against the compacted postings the anti-join and live-df
    // recount are no-ops, so queries are correct in both orders, while
    // deleting first would leave a crash window with stale gen-dir df and
    // no tombstones
    writeManifest(spark, root,
      (m -- m.keys.filter(k =>
        k.startsWith("lineage.append.") || k.startsWith("table."))) -
        "vacuum.pending" - "vacuum.tombfiles" - "append.deltas" +
        ("published" -> "true") + ("lineage.postings" -> perBucket))
    // retire EXACTLY the snapshot's tombstone files: ones appended during
    // the vacuum stay live (their docs either got compacted away — the
    // mask is then a no-op — or didn't, and the mask still hides them;
    // correct either way). A legacy pending manifest without the snapshot
    // key keeps the old whole-dir delete.
    m.get("vacuum.tombfiles") match {
      case Some(snap) =>
        snap.split(";").filter(_.nonEmpty)
          .foreach(n => f.delete(new Path(s"$root/tombstones/$n"), false))
        val dataLeft = f.exists(tombDir) && f.listStatus(tombDir)
          .exists(st => st.isFile && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
        if (!dataLeft) f.delete(tombDir, true)
      case None => f.delete(tombDir, true) // legacy pending manifest
    }
    // GC the superseded generation/delta dirs (post-commit; also re-swept
    // by the next append's publish if this crashes)
    f.listStatus(new Path(root)).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory &&
          (n.startsWith("termdict.g") || n.startsWith("fieldstats.g") ||
            n.startsWith("termdict.d") || n.startsWith("fieldstats.d")))
        f.delete(st.getPath, true)
    }
    ()
  }
}
