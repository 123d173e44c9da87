package graft

import org.apache.spark.sql.SparkSession

import graft.index.IndexCatalog
import graft.query.QueryEngine
import graft.score.BM25
import graft.tools.SourceCodeGen

/** Driver benchmark main: prints ONE JSON line with
  *  - per-contract-query seconds at `SPARK_GRAFT_SF_DIR` (driver metric),
  *  - index-BUILD throughput (files/sec) on the synthetic north-star
  *    `source_code` corpus (two indexed fields: content, path),
  *  - BM25 top-k latency p50 over the reference-style query set on the
  *    built index.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_FILES (source_code corpus size, default 200000).
  * Scaling-efficiency evidence (N vs 4N cores) is produced by
  * [[graft.tools.ScalingBench]], which reuses [[runBuild]]/[[runQueries]].
  */
object Bench {

  /** Full persisted index build (all stages written + published via
    * [[IndexCatalog]]) over a fresh synthetic corpus; returns (files/sec,
    * seconds, files). The output dir is wiped first so nothing resumes.
    */
  /** Materialize the synthetic corpus as a parquet table (the north-star
    * input is a TABLE, so generation cost must not pollute the indexing
    * metric). Reused across build runs of the same size.
    */
  def corpusTable(spark: SparkSession, nFiles: Long): String = {
    val dir = s"/tmp/graft_bench_corpus_$nFiles"
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"))) {
      f.delete(p, true)
      // 64 files so the indexing scan parallelizes regardless of core
      // count (one big file would cap the tokenize stage at
      // size/maxPartitionBytes splits). doc_id is MINTED from the natural
      // (repo, path, commit) key via DocIdMint — the north-star input has
      // no numeric key — and becomes stable by being persisted here.
      graft.tools.DocIdMint.mint(
        SourceCodeGen.generate(spark, nFiles).drop("doc_id").repartition(64))
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  def runBuild(spark: SparkSession, nFiles: Long,
      root: String = "/tmp/graft_bench_index"): (Double, Double, Long) = {
    val src = spark.read.parquet(corpusTable(spark, nFiles))
    val hadoopPath = new org.apache.hadoop.fs.Path(root)
    hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(hadoopPath, true)
    val t0 = System.nanoTime()
    IndexCatalog.build(src, "doc_id", Seq("content", "path"), root)
    val secs = (System.nanoTime() - t0) / 1e9
    (nFiles / secs, secs, nFiles)
  }

  /** Reference-style query mix: exact single term, exact multi-term
    * disjunction, prefix expansion, hot term.
    */
  val QuerySet: Seq[String] = Seq("ident7", "val return ident42",
    "Modu", "import", "fn match ident1")

  /** Median per-query latency (seconds) of block-max-WAND BM25 top-10 over
    * the PERSISTED compressed block table (built once, resumable stage).
    */
  def runWandQueries(spark: SparkSession, nFiles: Long, reps: Int = 3,
      root: String = "/tmp/graft_bench_index"): Double = {
    val idx = try IndexCatalog.read(spark, root) catch {
      // only the expected "nothing published here yet" shapes — a fatal
      // error (OOM, corrupt store) must not silently trigger a rebuild
      case _: IllegalArgumentException | _: org.apache.spark.sql.AnalysisException =>
        runBuild(spark, nFiles, root); IndexCatalog.read(spark, root)
    }
    IndexCatalog.buildBlocks(spark, root)
    // the block table is NOT cached: the deployment shape is the
    // (bucket, rg) partition-pruned parquet scan — a 100-TB block table
    // cannot live in memory, and a full-table cache defeats partition
    // pruning (every in-memory scan reads every cached batch, charging
    // each query a corpus-wide metadata pass)
    val (blocks, bs, rpg) = IndexCatalog.readBlocks(spark, root)
    idx.termdict.cache().count()
    QuerySet.foreach(q => graft.query.BlockMaxTopK
      .query(idx, blocks, q, BM25(), k = 10, blockSize = bs,
        rangesPerGroup = rpg).collect())
    val times = for (_ <- 1 to reps; q <- QuerySet) yield {
      val t0 = System.nanoTime()
      graft.query.BlockMaxTopK
        .query(idx, blocks, q, BM25(), k = 10, blockSize = bs,
          rangesPerGroup = rpg).collect()
      (System.nanoTime() - t0) / 1e9
    }
    idx.termdict.unpersist()
    val sorted = times.sorted
    sorted(sorted.size / 2)
  }

  /** Impact-ordered doc-id minting as the SHIPPED recipe (not just a demo):
    * the TIERED corpus (per-doc keyword-density tiers — the doc-level
    * score variance real corpora have) is minted two ways from the same
    * rows — (a) generation order (density-random doc-ids) and (b)
    * `DocIdMint.mintOrdered` by a STATIC, content-derived key (keyword
    * density, the impact-ordering analog of quality/source ordering) —
    * and the standard query mix runs over both persisted WAND stacks.
    * Reports per-variant exhaustive/WAND p50 plus the noise-free
    * pruningStats survivor counts, as one JSON fragment.
    */
  /** Cache-recipe fingerprint for the /tmp corpus+index artifacts: bump
    * whenever the tiered generator, minting key, or index/block layout
    * changes — a `_SUCCESS`-only check would silently reuse data built by
    * the OLD recipe and report its numbers (round-4 ADVICE).
    */
  val CacheRecipe = "r5a"

  def corpusTableTiered(spark: SparkSession, nFiles: Long,
      ordered: Boolean): String = {
    import org.apache.spark.sql.functions._
    val dir = s"/tmp/graft_bench_tier_${CacheRecipe}_${nFiles}_" + (if (ordered) "ord" else "rnd")
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"))) {
      f.delete(p, true)
      val kw = typedLit(SourceCodeGen.Keywords)
      val base = SourceCodeGen.generate(spark, nFiles, tiered = true)
        .drop("doc_id").repartition(64)
        .withColumn("kw_density",
          size(filter(split(col("content"), " "), t => array_contains(kw, t)))
            .cast("double") /
            greatest(size(split(col("content"), " ")), lit(1)).cast("double"))
      // ordering key = (coarse density band DESC, length ASC): the band
      // clusters score-correlated docs, and the SECONDARY LENGTH SORT is
      // load-bearing — without it every range mixes a long max-tf doc
      // with a short min-fl doc and the decoupled (max_tf, min_fl) bound
      // goes loose (measured: no pruning at all); length-homogeneous
      // ranges keep the stored pair describing the same regime
      val minted =
        if (ordered)
          graft.tools.DocIdMint.mintOrdered(base,
            Seq(round(col("kw_density") * 8).desc,
              size(split(col("content"), " ")).asc, col("path").asc))
        else graft.tools.DocIdMint.mint(base)
      minted.drop("kw_density").write.mode("overwrite").parquet(dir)
    }
    dir
  }

  def runWandMinted(spark: SparkSession, nFiles: Long, reps: Int = 3): String = {
    import org.apache.spark.sql.functions.col
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    val parts = for (ordered <- Seq(false, true)) yield {
      val tag = if (ordered) "ordered" else "unordered"
      val root = s"/tmp/graft_bench_tieridx_${CacheRecipe}_${nFiles}_" + (if (ordered) "ord" else "rnd")
      val idx = try IndexCatalog.read(spark, root) catch {
        case _: IllegalArgumentException | _: org.apache.spark.sql.AnalysisException =>
          IndexCatalog.build(
            spark.read.parquet(corpusTableTiered(spark, nFiles, ordered)),
            "doc_id", Seq("content", "path"), root)
          IndexCatalog.read(spark, root)
      }
      IndexCatalog.buildBlocks(spark, root)
      // uncached on purpose — see runWandQueries: partition-pruned
      // parquet is the deployment shape and beats a full-table cache
      val (blocks, bs, rpg) = IndexCatalog.readBlocks(spark, root)
      idx.termdict.cache().count()
      val qparts = QuerySet.map { q =>
        QueryEngine.query(idx, q, BM25(), limit = 10).collect() // warm
        graft.query.BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10,
          blockSize = bs, rangesPerGroup = rpg).collect()
        val ex = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          QueryEngine.query(idx, q, BM25(), limit = 10).collect()
          (System.nanoTime() - t0) / 1e9
        }
        val wd = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          graft.query.BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10,
            blockSize = bs, rangesPerGroup = rpg).collect()
          (System.nanoTime() - t0) / 1e9
        }
        val pr = graft.query.BlockMaxTopK
          .pruningStats(idx, blocks, q, BM25(), k = 10, blockSize = bs,
            rangesPerGroup = rpg)
          .map { case (t, s, _) => s"""{"ranges":$t,"survive":$s}""" }
          .getOrElse("null")
        f""""$q":{"exh_p50":${median(ex)}%.3f,"wand_p50":${median(wd)}%.3f,"prune":$pr}"""
      }
      idx.termdict.unpersist()
      s""""$tag":{${qparts.mkString(",")}}"""
    }
    s"""{"files":$nFiles,${parts.mkString(",")}}"""
  }

  /** Median per-query latency (seconds) of BM25 top-10 over a cached
    * index built from nFiles synthetic docs.
    */
  def runQueries(spark: SparkSession, nFiles: Long, reps: Int = 3,
      root: String = "/tmp/graft_bench_index"): Double = {
    // queries run against the PERSISTED index (partition-pruned scans),
    // reusing the artifact runBuild left behind (rebuilt if absent)
    val idx = try IndexCatalog.read(spark, root) catch {
      case _: IllegalArgumentException | _: org.apache.spark.sql.AnalysisException =>
        runBuild(spark, nFiles, root); IndexCatalog.read(spark, root)
    }
    idx.termdict.cache().count() // the dictionary is the hot small table
    // warm each plan once (codegen compiles per distinct query); report
    // steady-state latency
    QuerySet.foreach(q => QueryEngine.query(idx, q, BM25(), limit = 10).collect())
    val times = for (_ <- 1 to reps; q <- QuerySet) yield {
      val t0 = System.nanoTime()
      QueryEngine.query(idx, q, BM25(), limit = 10).collect()
      (System.nanoTime() - t0) / 1e9
    }
    idx.termdict.unpersist()
    val sorted = times.sorted
    sorted(sorted.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILES", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // driver contract: per-query seconds at sfDir. This VM has measured
    // bursty host CPU steal (identical jobs swing 5×+), so the official
    // artifact is MEDIAN-OF-3 per query with the cold (first) pass
    // disclosed separately — a single sample is a variance hostage.
    val reps = 3
    val names = SparkEntry.queries.keys.toSeq.sorted
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val errors = scala.collection.mutable.Map.empty[String, String]
    for (_ <- 1 to reps; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // the contract queries use the pipeline operators' default (global)
      // cache scope; flush it per rep — in a finally, so a throwing query
      // cannot leak its persists into every subsequent rep's storage
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case scala.util.control.NonFatal(e) =>
          errors(name) = e.getClass.getSimpleName; false }
        finally graft.pipeline.CacheScope.releaseGlobal()
      val secs = (System.nanoTime() - t0) / 1e9
      // a failed rep's time-to-failure is NOT a latency sample
      if (ok) samples(name) = samples.getOrElse(name, Nil) :+ secs
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    // a query with zero successful reps reports -1 and is listed in
    // query_errors — failure must be visible in the artifact, not a
    // plausible-looking number
    val medians = names.map(n =>
      n -> samples.get(n).filter(_.nonEmpty).map(median).getOrElse(-1.0))
    val qs = medians.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def firstOr(n: String): Double =
      samples.get(n).flatMap(_.headOption).getOrElse(-1.0)
    val qsCold = names.map(n => "\"" + n + "\":" + firstOr(n))
      .mkString("{", ",", "}")
    val errsJson = errors.toSeq.sorted
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = medians.map(_._2).filter(_ >= 0).sum
    val totalCold = names.map(firstOr).filter(_ >= 0).sum

    // the contract queries above leave cached index tables behind; drop
    // them so the build metric measures the build, not GC pressure from
    // another workload's cache
    spark.catalog.clearCache()

    // headline: build throughput (median of 3 FULL builds, each from a
    // wiped root; all samples disclosed) + query latency p50s (already
    // medians over reps × query set)
    val builds = (1 to reps).map(_ => runBuild(spark, nFiles))
    val buildSamples = builds.map(_._2)
    val buildSecs = median(buildSamples)
    val files = builds.head._3
    val fps = files / buildSecs
    val p50 = runQueries(spark, nFiles)
    val wandP50 = runWandQueries(spark, nFiles)
    // impact-ordered minting on the tiered corpus (the deployment recipe
    // for WAND; larger than the build corpus so decode volume, not fixed
    // job overhead, dominates — that is the regime pruning targets)
    val tierFiles = sys.env.getOrElse("SPARK_GRAFT_TIER_FILES", "800000").toLong
    val minted = runWandMinted(spark, tierFiles)

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""query_reps":$reps,"queries_cold":$qsCold,"total_cold":$totalCold,""" +
      s""""query_errors":$errsJson,""" +
      s""""build_files":$files,"build_secs":$buildSecs,""" +
      s""""build_samples_secs":[${buildSamples.mkString(",")}],""" +
      s""""build_files_per_sec":$fps,""" +
      s""""bm25_topk_p50_secs":$p50,"wand_topk_p50_secs":$wandP50,""" +
      s""""wand_minted":$minted,"cpus":"$cpus"}""")
    spark.stop()
  }
}
