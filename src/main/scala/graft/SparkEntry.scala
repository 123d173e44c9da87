package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, InvertedIndex, Mutations}
import graft.pipeline.{Dedup, Multimodal, Packing, Sampling, Similarity, TextStats}
import graft.query.{QueryEngine, ShardedSearch}
import graft.score.{BM25, ZeroToOne}

/** Build-once-query-many cache of the documents index per testdata dir
  * (the real-world deployment shape: the index is a persisted artifact,
  * queries reuse it).
  */
object IndexCache {
  private val cache = TrieMap.empty[String, InvertedIndex]
  def documents(spark: SparkSession, dir: String): InvertedIndex =
    cache.getOrElseUpdate(dir,
      IndexBuilder.build(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", Seq("text"))
        .cached())

  /** Two-field index over (text, source) — multi-field scoring under the
    * driver's oracle gate (the reference is 2-field in most of its tests).
    */
  private val multiCache = TrieMap.empty[String, InvertedIndex]
  def documentsMulti(spark: SparkSession, dir: String): InvertedIndex =
    multiCache.getOrElseUpdate(dir,
      IndexBuilder.build(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id",
        Seq("text", "source")).cached())

  /** Same corpus indexed with the CODE tokenizer (tokenizer SPI —
    * reference passes the tokenizer per call, /root/reference/src/lib.rs:13-14).
    */
  private val codeCache = TrieMap.empty[String, InvertedIndex]
  def documentsCode(spark: SparkSession, dir: String): InvertedIndex =
    codeCache.getOrElseUpdate(dir,
      IndexBuilder.build(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", Seq("text"),
        tokenizer = graft.analysis.Analyzer.codeTokensCol)
        .cached())

  private def sanitize(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_")

  private def wipe(spark: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  /** Persisted-catalog index over the documents corpus — the DEPLOYMENT
    * shape under the driver's oracle gate: manifest read, bucket-partitioned
    * parquet scan with partition pruning, NOT the in-memory cache the other
    * queries use. Built once per dir per JVM into /tmp (wiped first so
    * nothing resumes from a stale artifact).
    */
  private val persistCache = TrieMap.empty[String, InvertedIndex]
  def documentsPersisted(spark: SparkSession, dir: String): InvertedIndex =
    persistCache.getOrElseUpdate(dir, {
      val root = s"/tmp/graft_gate_idx_${sanitize(dir)}"
      wipe(spark, root)
      graft.index.IndexCatalog.build(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", Seq("text"), root)
    })

  /** The persisted gate index plus its fuzzy deletion-variant table
    * ([[graft.index.IndexCatalog.buildFuzzy]]) — q49 resolves Levenshtein-1
    * expansions through partition-pruned variant point lookups, the
    * 10^9-term-scale path, NOT a dictionary levenshtein scan.
    */
  private val fuzzyCache = TrieMap.empty[String, (InvertedIndex, String)]
  def documentsFuzzyPersisted(spark: SparkSession, dir: String): (InvertedIndex, String) =
    fuzzyCache.getOrElseUpdate(dir, {
      documentsPersisted(spark, dir) // ensure the base index exists
      val root = s"/tmp/graft_gate_idx_${sanitize(dir)}"
      graft.index.IndexCatalog.buildFuzzy(spark, root)
      (graft.index.IndexCatalog.read(spark, root), root)
    })

  /** Persisted index built on a doc SUBSET then extended by the
    * crash-safe incremental-append protocol with the remainder — the
    * append must be invisible (oracle = full-corpus BM25).
    */
  private val appendCache = TrieMap.empty[String, InvertedIndex]
  def documentsAppended(spark: SparkSession, dir: String): InvertedIndex =
    appendCache.getOrElseUpdate(dir, {
      import org.apache.spark.sql.functions.col
      val root = s"/tmp/graft_gate_app_${sanitize(dir)}"
      wipe(spark, root)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      graft.index.IndexCatalog.build(
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id", Seq("text"), root)
      graft.index.IndexCatalog.addDocuments(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", root)
    })

  /** The full persisted MUTATION LIFECYCLE under the gate: build on the
    * whole corpus, tombstone a predicate-derived doc set (DataFrame-native
    * — no removal id ever transits the driver), `vacuum` (stage-atomic
    * compaction rewrite), rebuild the block table over the compacted
    * postings, and serve WAND from it. The oracle is BM25 over the corpus
    * WITH the same predicate filter, so any vacuum artifact (resurrected
    * posting, stale df/stats, stale block) breaks the hash.
    */
  private val vacCache = TrieMap.empty[String,
    (InvertedIndex, org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block], Long, Long)]
  def documentsVacuumed(spark: SparkSession, dir: String): (InvertedIndex, org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block], Long, Long) =
    vacCache.getOrElseUpdate(dir, {
      val root = s"/tmp/graft_gate_vac_${sanitize(dir)}"
      wipe(spark, root)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      graft.index.IndexCatalog.build(docs, "doc_id", Seq("text"), root)
      graft.index.IndexCatalog.removeDocuments(root,
        docs.filter(col("doc_id") % 5 === 0).select("doc_id"))
      graft.index.IndexCatalog.vacuum(spark, root)
      graft.index.IndexCatalog.buildBlocks(spark, root)
      val idx = graft.index.IndexCatalog.read(spark, root)
      val (blocks, bs, rpg) = graft.index.IndexCatalog.readBlocks(spark, root)
      (idx, blocks, bs, rpg)
    })

  /** PERSISTED SHARD-MERGE lifecycle under the gate (q71): the corpus split
    * by doc-id parity, each half built as its OWN persisted catalog (the
    * independent-shard build topology), the two roots merged file-level by
    * [[graft.index.IndexCatalog.mergeShards]], blocks built over the merged
    * store, and WAND served from it. Oracle = full-corpus BM25, so a
    * missed/duplicated shard file, a df mis-sum, or a stats mis-fold
    * breaks the hash.
    */
  private val shardMergeCache = TrieMap.empty[String,
    (InvertedIndex, org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block], Long, Long)]
  def documentsShardMerged(spark: SparkSession, dir: String): (InvertedIndex, org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block], Long, Long) =
    shardMergeCache.getOrElseUpdate(dir, {
      import org.apache.spark.sql.functions.col
      val rootA = s"/tmp/graft_gate_shA_${sanitize(dir)}"
      val rootB = s"/tmp/graft_gate_shB_${sanitize(dir)}"
      val out = s"/tmp/graft_gate_shM_${sanitize(dir)}"
      Seq(rootA, rootB, out).foreach(wipe(spark, _))
      val d = spark.read.parquet(s"$dir/documents.parquet")
      graft.index.IndexCatalog.build(
        d.filter(col("doc_id") % 2 === 0), "doc_id", Seq("text"), rootA)
      graft.index.IndexCatalog.build(
        d.filter(col("doc_id") % 2 === 1), "doc_id", Seq("text"), rootB)
      val idx = graft.index.IndexCatalog.mergeShards(
        spark, Seq(rootA, rootB), out)
      graft.index.IndexCatalog.buildBlocks(spark, out)
      val (blocks, bs, rpg) = graft.index.IndexCatalog.readBlocks(spark, out)
      (idx, blocks, bs, rpg)
    })

  /** The INCREMENTAL block-maintenance lifecycle under the gate (q43):
    * build on a subset, build the block table, append the remainder, then
    * `buildBlocks` again — which must FOLD the delta in O(delta)
    * (IndexCatalog.foldAppendDeltas swaps only the touched (bucket, rg)
    * partitions) rather than rebuild from the full posting store — and
    * serve WAND from the folded table. Oracle = full-corpus BM25 top-k,
    * so a missed delta range, a double-folded posting, or a stale block
    * breaks the hash.
    */
  private val appBlkCache = TrieMap.empty[String,
    (InvertedIndex, org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block], Long, Long)]
  def documentsAppendedBlocks(spark: SparkSession, dir: String): (InvertedIndex, org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block], Long, Long) =
    appBlkCache.getOrElseUpdate(dir, {
      val root = s"/tmp/graft_gate_ablk_${sanitize(dir)}"
      wipe(spark, root)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      graft.index.IndexCatalog.build(
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id", Seq("text"), root)
      graft.index.IndexCatalog.buildBlocks(spark, root)
      graft.index.IndexCatalog.addDocuments(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", root)
      graft.index.IndexCatalog.buildBlocks(spark, root) // incremental fold
      val idx = graft.index.IndexCatalog.read(spark, root)
      val (blocks, bs, rpg) = graft.index.IndexCatalog.readBlocks(spark, root)
      (idx, blocks, bs, rpg)
    })

  /** Streaming ingestion under the gate: a quarter of the corpus seeds the
    * persisted index, the rest arrives as a file STREAM (one micro-batch
    * per file via maxFilesPerTrigger) through [[graft.streaming.StreamingIndexer]]
    * — each batch one crash-safe incremental append. The oracle is the
    * FULL corpus, so a dropped/duplicated batch breaks the hash.
    */
  private val streamCache = TrieMap.empty[String, InvertedIndex]
  def documentsStreamed(spark: SparkSession, dir: String): InvertedIndex =
    streamCache.getOrElseUpdate(dir, {
      val root = s"/tmp/graft_gate_str_${sanitize(dir)}"
      wipe(spark, root)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val idxRoot = s"$root/idx"
      graft.index.IndexCatalog.build(
        docs.filter(col("doc_id") % 4 === 0), "doc_id", Seq("text"), idxRoot)
      val srcDir = s"$root/src"
      docs.filter(col("doc_id") % 4 =!= 0).repartition(3).write.parquet(srcDir)
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = graft.streaming.StreamingIndexer.start(
        stream, "doc_id", idxRoot, s"$root/ckpt")
      q.awaitTermination()
      graft.index.IndexCatalog.read(spark, idxRoot)
    })

  /** Compressed block table of the PERSISTED gate index — built through
    * `IndexCatalog.buildBlocks` (resumable stage, manifest-keyed) and read
    * back from parquet, NOT the in-memory block cache: puts the persisted
    * block/WAND machinery under the external oracle.
    */
  private val persistBlockCache =
    TrieMap.empty[String, (org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block], Long, Long)]
  def blocksPersisted(spark: SparkSession, dir: String): (org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block], Long, Long) =
    persistBlockCache.getOrElseUpdate(dir, {
      documentsPersisted(spark, dir) // ensure the index exists first
      val root = s"/tmp/graft_gate_idx_${sanitize(dir)}"
      graft.index.IndexCatalog.buildBlocks(spark, root)
      graft.index.IndexCatalog.readBlocks(spark, root)
    })

  /** Persisted ANN index over the embeddings (bucket-partitioned sign-LSH
    * assignment, [[graft.index.VectorIndex]]); returns its root.
    */
  private val vecCache = TrieMap.empty[String, String]
  def vectorsPersisted(spark: SparkSession, dir: String): String =
    vecCache.getOrElseUpdate(dir, {
      val root = s"/tmp/graft_gate_vec_${sanitize(dir)}"
      wipe(spark, root)
      graft.index.VectorIndex.build(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", 64, 8, root)
      root
    })

  /** Persisted IVF index over the embeddings (cell-partitioned
    * nearest-centroid assignment, [[graft.index.IvfIndex]], 16 cells —
    * q44's quantizer config so the q44 oracle transfers); returns its root.
    */
  private val ivfCache = TrieMap.empty[String, String]
  def ivfPersisted(spark: SparkSession, dir: String): String =
    ivfCache.getOrElseUpdate(dir, {
      val root = s"/tmp/graft_gate_ivf_${sanitize(dir)}"
      wipe(spark, root)
      graft.index.IvfIndex.build(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", 64, 16, root)
      root
    })

  /** Streamed IVF index under the gate: the first HALF of the embeddings
    * (vec_id < count/2) seeds the persisted [[graft.index.IvfIndex]] — and
    * therefore its FROZEN centroid sample — and the rest arrives as a file
    * STREAM (one micro-batch per file) through
    * [[graft.streaming.StreamingVectorIndexer]], each batch one
    * exactly-once O(batch) append. The oracle recomputes the centroid
    * sample over the build slice only but assigns/probes the FULL corpus,
    * so a dropped/duplicated batch OR a quantizer re-train both break the
    * hash.
    */
  private val sivfCache = TrieMap.empty[String, String]
  def ivfStreamed(spark: SparkSession, dir: String): String =
    sivfCache.getOrElseUpdate(dir, {
      val root = s"/tmp/graft_gate_sivf_${sanitize(dir)}"
      wipe(spark, root)
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      val half = e.count() / 2
      val idxRoot = s"$root/idx"
      graft.index.IvfIndex.build(e.filter(col("vec_id") < half),
        "vec_id", "embedding", 64, 16, idxRoot)
      val srcDir = s"$root/src"
      e.filter(col("vec_id") >= half).repartition(3).write.parquet(srcDir)
      val stream = spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = graft.streaming.StreamingVectorIndexer.start(
        stream, "vec_id", "embedding", idxRoot, s"$root/ckpt")
      q.awaitTermination()
      idxRoot
    })

  /** Compressed block table for the documents index, built ONCE per dir and
    * cached: BlockMaxTopK runs three actions over the block table (UB probe,
    * θ scoring, final scan) — without this the full postings→blocks shuffle
    * re-runs per action, per query. `localCheckpoint` (not `cache`): same
    * storage, but the postings→blocks build plan is TRUNCATED, so the three
    * actions per WAND query stop re-analyzing it (see
    * [[graft.index.InvertedIndex.cached]]).
    */
  private val blockCache =
    TrieMap.empty[String, org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block]]
  val BlockSize = 512L
  def blocks(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block] =
    blockCache.getOrElseUpdate(dir,
      graft.index.PostingBlocks
        .fromPostings(documents(spark, dir).postings, 1, BlockSize)
        .localCheckpoint())

  /** DFS scatter-gather shard handles (q84) — three disjoint IN-MEMORY
    * shards prepared ONCE per dir per JVM through
    * [[graft.query.ShardedSearch.prepareShards]] (global dictionary + field
    * stats folded at prepare time, the once-per-index-generation pattern the
    * serving topology documents), the folded dictionary materialized and
    * SHARED by every handle. Same build-once-query-many shape as
    * [[documents]]; the first (cold) invocation still pays the full
    * build+fold lifecycle.
    */
  private val dfsCache = TrieMap.empty[String, Seq[InvertedIndex]]
  def dfsShardsPrepared(spark: SparkSession, dir: String): Seq[InvertedIndex] =
    dfsCache.getOrElseUpdate(dir, {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val shards = Seq(0, 1, 2).map(r =>
        IndexBuilder.build(d.filter(col("doc_id") % 3 === r), "doc_id",
          Seq("text")).cached())
      val prepared = ShardedSearch.prepareShards(shards)
      val gdict = prepared.head.termdict.localCheckpoint()
      prepared.map(_.copy(termdict = gdict))
    })

  /** WAND-served scatter-gather stack (q88) — two PERSISTED catalog roots
    * (doc-id parity split) + per-root block tables built ONCE per dir per
    * JVM (wiped first, so nothing resumes from a stale artifact; fixes the
    * round-5 ADVICE temp-dir leak — the old per-invocation
    * `createTempDirectory` was never deleted), handles prepared through
    * [[graft.query.ShardedSearch.prepareShardsWand]] with the folded global
    * dictionary materialized and shared. The posting/block scans stay the
    * persisted bucket/rg partition-pruned parquet scans — only the
    * vocab-sized dictionary fold is held in memory, exactly what a serving
    * deployment pins per index generation.
    */
  private val dfsWandCache = TrieMap.empty[String,
    (Seq[InvertedIndex], Seq[org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block]], Long, Long)]
  def dfsWandPrepared(spark: SparkSession, dir: String):
      (Seq[InvertedIndex], Seq[org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block]], Long, Long) =
    dfsWandCache.getOrElseUpdate(dir, {
      val base = s"/tmp/graft_gate_dfsw_${sanitize(dir)}"
      wipe(spark, base)
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val roots = Seq(0, 1).map { r =>
        val root = s"$base/s$r"
        graft.index.IndexCatalog.build(d.filter(col("doc_id") % 2 === r),
          "doc_id", Seq("text"), root)
        graft.index.IndexCatalog.buildBlocks(spark, root)
        root
      }
      val shards = roots.map(graft.index.IndexCatalog.read(spark, _))
      val blocks = roots.map(r => graft.index.IndexCatalog.readBlocks(spark, r))
      val prepared = ShardedSearch.prepareShardsWand(shards)
      val gdict = prepared.head.termdict.localCheckpoint()
      (prepared.map(_.copy(termdict = gdict)), blocks.map(_._1),
        blocks.head._2, blocks.head._3)
    })

  /** Relationally MERGED in-memory shard index (q70) — the two parity
    * shards built and merged ONCE per dir per JVM, the merged tables
    * materialized via [[InvertedIndex.cached]] (build-once-query-many, like
    * every other lifecycle cache here; the cold invocation pays the full
    * build+merge).
    */
  private val memMergeCache = TrieMap.empty[String, InvertedIndex]
  def documentsMergedInMemory(spark: SparkSession, dir: String): InvertedIndex =
    memMergeCache.getOrElseUpdate(dir, {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val a = IndexBuilder.build(
        d.filter(col("doc_id") % 2 === 0), "doc_id", Seq("text"))
      val b = IndexBuilder.build(
        d.filter(col("doc_id") % 2 === 1), "doc_id", Seq("text"))
      InvertedIndex.merge(a, b).cached()
    })
}

/** Driver contract — one `queries` entry per operator (SURVEY.md §2), with
  * a DuckDB-equivalent `oracleSql` for everything SQL-expressible.
  *
  * Float-valued outputs are emitted as MICRO-UNIT LONGS
  * (`cast(round(x*1e6) as bigint)`) on BOTH sides: DuckDB's `round` returns
  * DECIMAL and cross-engine f64 accumulation differs in the last ulp, so
  * integer micro-units are the hash-stable encoding of "equal to 1e-6".
  */
object SparkEntry {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  private def micro(c: org.apache.spark.sql.Column) =
    round(c * lit(1e6)).cast("long")

  /** q51's per-stratum mixing rates (source srcK → K/20): defined once so
    * the Spark filter and the generated oracle CASE can never drift.
    */
  private val SampleRates: Map[String, Double] =
    (0 until 20).map(k => s"src$k" -> k / 20.0).toMap

  /** Flagship: BM25 top-10 over the sf0.001 documents corpus. */
  def entry(spark: SparkSession): DataFrame = {
    val idx = IndexCache.documents(spark, "/root/testdata/sf0.001")
    QueryEngine.query(idx, "spark merge", BM25(), limit = 10)
  }

  // ---------- shared oracle SQL fragments (DuckDB dialect) ----------

  private val ToksCte =
    "toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs)"

  /** Code-tokenizer variant of the toks CTE — must mirror
    * `Analyzer.CodeTokenPattern` exactly.
    */
  private val CodeToksCte =
    """toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[^A-Za-z0-9_\s]')) AS term FROM docs)"""

  /** Full BM25 pipeline in ANSI-ish SQL (DuckDB): tokenize → doclen/stats →
    * occurrence-df postings → prefix expansion → idf/boost → per-(doc,qti)
    * max → per-doc sum. Mirrors the engine exactly (k1=1.2, b=0.75).
    */
  private def bm25Sql(qterms: Seq[String], filter: String,
      finalOrder: String = "ORDER BY doc_id",
      toksCte: String = ToksCte, fuzzy: Boolean = false,
      docWhere: String = "", conjunctive: Boolean = false,
      qtSelect: String = "", exclTerms: Seq[String] = Nil,
      explainTopK: Int = 0, qpairs: Seq[(Int, String)] = Nil,
      minMatch: Int = 0, exactExp: Boolean = false,
      factorExpr: String = "", termWeights: Seq[Double] = Nil,
      mustCount: Int = 0): String = {
    // qtSelect replaces the literal query-term VALUES with a COMPUTED
    // (qti, qterm) select — q61's more-like-this derives its query terms
    // from the data (the seed doc's tf-idf top terms)
    // qpairs (synonym mode): explicit (qti, variant) rows — several
    // variants may share one query-term slot, merged by the same
    // per-(doc, qti) max as everywhere else
    val qvals =
      if (qpairs.nonEmpty) qpairs.map { case (i, t) => s"($i, '$t')" }.mkString(", ")
      else qterms.zipWithIndex.map { case (t, i) => s"($i, '$t')" }.mkString(", ")
    // fuzzy mode (q49): Levenshtein-1 expansion instead of prefix, and the
    // edit-distance boost generalization (equal to the prefix formula on
    // prefix pairs — see graft.score.BM25 scaladoc)
    val expJoin =
      if (exactExp) "tdf.term = qt.qterm"
      else if (fuzzy) "levenshtein(tdf.term, qt.qterm) <= 1"
      else "tdf.term LIKE qt.qterm || '%'"
    val boostExpr =
      if (fuzzy)
        """CASE WHEN e.eterm = e.qterm THEN 1.0
          |       ELSE ln(1 + 1.0 / (1.0 + levenshtein(e.eterm, e.qterm))) END""".stripMargin
      else
        """CASE WHEN e.eterm = e.qterm THEN 1.0
          |       ELSE ln(1 + 1.0 / (1.0 + strlen(e.eterm) - strlen(e.qterm))) END""".stripMargin
    s"""WITH docs AS (SELECT doc_id, text FROM documents $filter),
       |$toksCte,
       |doclen AS (
       |  SELECT d.doc_id, coalesce(t.fl, 0) AS fl FROM docs d
       |  LEFT JOIN (SELECT doc_id, count(*) AS fl FROM toks GROUP BY doc_id) t
       |  ON d.doc_id = t.doc_id),
       |stats AS (SELECT count(*) AS n, sum(fl) AS s FROM doclen),
       |post AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id),
       |tdf AS (SELECT term, sum(tf) AS df FROM post GROUP BY term),
       |qt AS (${if (qtSelect.nonEmpty) qtSelect
         else s"SELECT * FROM (VALUES $qvals) AS t(qti, qterm)"}),
       |exp AS (SELECT qt.qti, qt.qterm, tdf.term AS eterm, tdf.df
       |        FROM qt JOIN tdf ON $expJoin),${
         // per-term weights (q77 boostedQuery): the slot weight multiplies
         // the expansion boost INSIDE esc — the engine's exact composition
         // point (eboost·tboost before scoring), so max/sum stay identical
         if (termWeights.isEmpty) ""
         else s"""
           |wt AS (SELECT * FROM (VALUES ${termWeights.zipWithIndex
             .map { case (w, i) => s"($i, CAST($w AS DOUBLE))" }
             .mkString(", ")}) AS t(qti, w)),""".stripMargin
       }
       |esc AS (SELECT e.qti, e.eterm,
       |  ln(1 + ((st.n - least(st.n, e.df)) + 0.5) / (least(st.n, e.df) + 0.5)) AS idf,
       |  ${if (termWeights.isEmpty) s"$boostExpr AS boost"
         else s"($boostExpr) * wt.w AS boost"}
       |  FROM exp e${if (termWeights.isEmpty) ""
         else " JOIN wt ON wt.qti = e.qti"}, stats st),
       |${if (explainTopK > 0)
         // explain mode keeps the per-expansion score (scx) so the final
         // select can pick each (doc, qti)'s winning expansion; sc stays
         // the same max-grouped relation the normal mode computes directly
         """scx AS (SELECT p.doc_id, s.qti, s.eterm,
           |  ((1.2 + 1.0) * p.tf) /
           |      (1.2 * ((1.0 - 0.75) + 0.75 * (d.fl / (st.s * 1.0 / st.n))) + p.tf)
           |      * s.idf * s.boost AS ets
           |  FROM post p JOIN esc s ON p.term = s.eterm
           |  JOIN doclen d ON d.doc_id = p.doc_id, stats st),
           |sc AS (SELECT doc_id, qti, max(ets) AS mts FROM scx
           |  GROUP BY doc_id, qti)""".stripMargin
       else
         """sc AS (SELECT p.doc_id, s.qti,
           |  max(((1.2 + 1.0) * p.tf) /
           |      (1.2 * ((1.0 - 0.75) + 0.75 * (d.fl / (st.s * 1.0 / st.n))) + p.tf)
           |      * s.idf * s.boost) AS mts
           |  FROM post p JOIN esc s ON p.term = s.eterm
           |  JOIN doclen d ON d.doc_id = p.doc_id, stats st
           |  GROUP BY p.doc_id, s.qti)""".stripMargin
       }${
         // conj doubles as the minimum-should-match set: `= n` for AND,
         // `>= m` for m-of-n (the engine's minMatchFilter threshold);
         // mustCount (q79 bool): only the FIRST mustCount slots are
         // required — the engine's conjunctiveFilter over the must clause
         // alone, whose tokens lead the concatenated scored query
         val conjHaving =
           if (mustCount > 0) s"= $mustCount"
           else if (conjunctive) s"= ${qterms.length}"
           else if (minMatch > 0) s">= $minMatch"
           else ""
         val conjWhere = if (mustCount > 0) s" WHERE e.qti < $mustCount" else ""
         if (conjHaving.isEmpty) ""
         else s""",
           |conj AS (SELECT p.doc_id FROM post p JOIN exp e ON p.term = e.eterm$conjWhere
           |        GROUP BY p.doc_id HAVING count(DISTINCT e.qti) $conjHaving)""".stripMargin
       }${if (exclTerms.isEmpty) ""
         else s""",
           |excl AS (SELECT DISTINCT doc_id FROM post WHERE ${
             exclTerms.map(t => s"term LIKE '$t%'").mkString(" OR ")})""".stripMargin
       }
       |${
         val conds = Seq(
           if (docWhere.nonEmpty)
             Some(s"doc_id IN (SELECT doc_id FROM documents $docWhere)")
           else None,
           if (conjunctive || minMatch > 0 || mustCount > 0)
             Some("doc_id IN (SELECT doc_id FROM conj)")
           else None,
           if (exclTerms.nonEmpty)
             Some("doc_id NOT IN (SELECT doc_id FROM excl)")
           else None).flatten
         val where =
           if (conds.isEmpty) "" else conds.mkString("WHERE ", " AND ", " ")
         if (explainTopK > 0)
           // per-(doc, qti) breakdown for the top-k docs: winner = the
           // expansion with the highest micro-rounded score, term asc on
           // ties — the identical deterministic argmax the engine applies
           s""", topk AS (SELECT doc_id FROM sc $where
             |  GROUP BY doc_id
             |  ORDER BY CAST(round(sum(mts) * 1000000.0) AS BIGINT) DESC,
             |    doc_id ASC LIMIT $explainTopK)
             |SELECT x.doc_id, x.qti, qt.qterm AS qterm,
             |  x.eterm AS best_term, x.ets_micro AS term_score_micro
             |FROM (SELECT doc_id, qti, eterm,
             |        CAST(round(ets * 1000000.0) AS BIGINT) AS ets_micro,
             |        row_number() OVER (PARTITION BY doc_id, qti
             |          ORDER BY CAST(round(ets * 1000000.0) AS BIGINT) DESC,
             |            eterm ASC) AS rn
             |      FROM scx WHERE doc_id IN (SELECT doc_id FROM topk)) x
             |JOIN qt ON qt.qti = x.qti
             |WHERE x.rn = 1 ORDER BY x.doc_id, x.qti""".stripMargin
         else if (factorExpr.nonEmpty)
           // function-score mode (q74): the raw per-doc sum is multiplied
           // by a row-attribute factor BEFORE micro rounding — the same
           // composition point as the engine's Fusion.functionScore
           // the shared WHERE conds (bare doc_id refs) bind inside the
           // sc-only inner aggregate; documents joins OUTSIDE it, so the
           // factor columns can never collide with the conds, and the
           // outer subquery means $finalOrder binds the OUTPUT doc_id
           s"""SELECT doc_id, score_micro FROM (
             |  SELECT r.doc_id,
             |    CAST(round(r.raw * ($factorExpr) * 1000000.0) AS BIGINT) AS score_micro
             |  FROM (SELECT doc_id, sum(mts) AS raw
             |        FROM sc ${where}GROUP BY doc_id) r
             |  JOIN documents d ON d.doc_id = r.doc_id) fscored $finalOrder""".stripMargin
         else
           s"""SELECT doc_id, CAST(round(sum(mts) * 1000000.0) AS BIGINT) AS score_micro
             |FROM sc ${where}GROUP BY doc_id $finalOrder""".stripMargin
       }""".stripMargin
  }

  private val ShinglesCte =
    """tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM tk WHERE len(t) >= 3),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx)""".stripMargin

  // Carter–Wegman minhash family: ONE md5 per shingle, member j derived as
  // h1 + j·h2 from the digest's two 56-bit halves (Portable.md5Halves)
  private val SigCte =
    s"""$ShinglesCte,
       |hx AS (SELECT doc_id, md5(shingle) AS hex FROM sh),
       |hv AS (SELECT doc_id, j,
       |         CAST(('0x' || substr(hex, 1, 14)) AS BIGINT)
       |         + j * CAST(('0x' || substr(hex, 15, 14)) AS BIGINT) AS v
       |       FROM hx, generate_series(0, 7) hj(j)),
       |sig AS (SELECT doc_id, j AS h, min(v) AS minhash FROM hv GROUP BY doc_id, j)""".stripMargin

  /** Zero-to-one over "spark merge" in SQL — exact under the
    * prefix-disjoint reduction (expansion sets of prefix-disjoint query
    * terms share no expanded term, so the greedy df-pool never re-touches
    * a node; per (doc, qti) the max-score entry consumes).
    */
  private def ztoSql(finalOrder: String = "ORDER BY doc_id"): String =
    s"""WITH docs AS (SELECT doc_id, text FROM documents),
       |toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs),
       |t AS (SELECT doc_id, count(*) AS fl FROM toks GROUP BY doc_id),
       |doclen AS (SELECT d.doc_id, coalesce(t.fl, 0) AS fl FROM docs d LEFT JOIN t ON d.doc_id = t.doc_id),
       |post AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id),
       |tdf AS (SELECT DISTINCT term FROM post),
       |qt AS (SELECT * FROM (VALUES (0, 'spark'), (1, 'merge')) AS t(qti, qterm)),
       |exp AS (SELECT qt.qti, qt.qterm, tdf.term AS eterm FROM qt JOIN tdf ON tdf.term LIKE qt.qterm || '%'),
       |ent AS (SELECT p.doc_id, e.qti, e.eterm,
       |         1.0 - (strlen(e.eterm) - strlen(e.qterm)) * 1.0 / strlen(e.eterm) AS score,
       |         p.tf, d.fl
       |        FROM post p JOIN exp e ON p.term = e.eterm JOIN doclen d ON d.doc_id = p.doc_id),
       |best AS (SELECT doc_id, qti, score, tf, fl,
       |         row_number() OVER (PARTITION BY doc_id, qti ORDER BY score DESC, eterm ASC) AS rn FROM ent),
       |contrib AS (SELECT doc_id, least(score / tf, 1.0) * tf / greatest(fl, 2) AS c FROM best WHERE rn = 1)
       |SELECT doc_id, CAST(round(sum(c) * 1000000.0) AS BIGINT) AS score_micro
       |FROM contrib GROUP BY doc_id $finalOrder""".stripMargin

  /** Shared oracle for q22 (index-free ANN), q36 (persisted VectorIndex),
    * and q54 (filtered ANN — `candPred` restricts the candidate set with a
    * metadata predicate, exactly where the engine semi-joins its filter):
    * sign-LSH buckets (the q16 math), the 1-bit multiprobe set, exact
    * cosine on candidates, tie-stable micro-unit top-20.
    */
  private def annLshTopKSql(candPred: String = ""): String =
    s"""WITH hp AS (SELECT gb.b AS b, gi.i AS i,
      |    CASE WHEN (CAST(('0x' || substr(md5('hp:' || CAST(gb.b AS VARCHAR) || ':' || CAST(gi.i AS VARCHAR)), 1, 15)) AS BIGINT) & 1) = 1 THEN 1.0 ELSE -1.0 END AS s
      |  FROM generate_series(0, 7) gb(b), generate_series(0, 63) gi(i)),
      |proj AS (SELECT e.vec_id, hp.b, sum(CAST(e.embedding[hp.i + 1] AS DOUBLE) * hp.s) AS p
      |         FROM embeddings e, hp GROUP BY e.vec_id, hp.b),
      |bkt AS (SELECT vec_id, CAST(sum(CASE WHEN p > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS BIGINT) AS bucket FROM proj GROUP BY vec_id),
      |qb AS (SELECT bucket AS qbkt FROM bkt WHERE vec_id = 0),
      |probes AS (SELECT qbkt AS pb FROM qb UNION ALL SELECT xor(qbkt, (1::BIGINT << g.b)) FROM qb, generate_series(0, 7) g(b)),
      |cand AS (SELECT b.vec_id FROM bkt b JOIN embeddings em ON em.vec_id = b.vec_id
      |         WHERE b.bucket IN (SELECT pb FROM probes)$candPred),
      |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |parts AS (SELECT e.vec_id,
      |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(q.qv[g.i] AS DOUBLE)) AS dot,
      |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(e.embedding[g.i] AS DOUBLE)) AS nd,
      |    sum(CAST(q.qv[g.i] AS DOUBLE) * CAST(q.qv[g.i] AS DOUBLE)) AS nq
      |  FROM embeddings e JOIN cand c ON e.vec_id = c.vec_id, q, generate_series(1, 64) g(i) GROUP BY e.vec_id)
      |SELECT vec_id, CAST(round((dot / (sqrt(nd) * sqrt(nq))) * 1000000.0) AS BIGINT) AS cos_micro
      |FROM parts ORDER BY cos_micro DESC, vec_id ASC LIMIT 20""".stripMargin

  /** Oracle for q44/q45/q46 (IVF ANN): the identical deterministic
    * centroid sample (16 smallest md5("ivf:"||vec_id) among the rows
    * matching `centsFilter`, dense cells in hash order), argmax-cosine
    * assignment over the FULL corpus (tiebreak: lowest cell), the query's
    * 4 nearest cells, exact cosine on the probe set, tie-stable micro-unit
    * top-20. ONE builder for all three gates — the sample filter is the
    * only difference, so an oracle fix can never diverge between them.
    */
  private def ivfOracleSql(centsFilter: String): String =
    s"""WITH hk AS (SELECT vec_id, embedding,
      |    CAST(('0x' || substr(md5('ivf:' || CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hk
      |  FROM embeddings),
      |cents AS (SELECT row_number() OVER (ORDER BY hk ASC, vec_id ASC) - 1 AS cell,
      |    embedding AS cv
      |  FROM hk $centsFilter ORDER BY hk ASC, vec_id ASC LIMIT 16),
      |cc AS (SELECT e.vec_id, c.cell,
      |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(c.cv[g.i] AS DOUBLE)) AS dot,
      |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(e.embedding[g.i] AS DOUBLE)) AS ne,
      |    sum(CAST(c.cv[g.i] AS DOUBLE) * CAST(c.cv[g.i] AS DOUBLE)) AS nc
      |  FROM embeddings e, cents c, generate_series(1, 64) g(i)
      |  GROUP BY e.vec_id, c.cell),
      |asg AS (SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell,
      |      row_number() OVER (PARTITION BY vec_id
      |        ORDER BY dot / (sqrt(ne) * sqrt(nc)) DESC, cell ASC) AS rn
      |    FROM cc) WHERE rn = 1),
      |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |qc AS (SELECT c.cell,
      |    sum(CAST(c.cv[g.i] AS DOUBLE) * CAST(q.qv[g.i] AS DOUBLE)) AS dot,
      |    sum(CAST(c.cv[g.i] AS DOUBLE) * CAST(c.cv[g.i] AS DOUBLE)) AS nc,
      |    sum(CAST(q.qv[g.i] AS DOUBLE) * CAST(q.qv[g.i] AS DOUBLE)) AS nq
      |  FROM cents c, q, generate_series(1, 64) g(i) GROUP BY c.cell),
      |probes AS (SELECT cell FROM (
      |    SELECT cell, row_number() OVER (
      |      ORDER BY dot / (sqrt(nc) * sqrt(nq)) DESC, cell ASC) AS rn
      |    FROM qc) WHERE rn <= 4),
      |cand AS (SELECT a.vec_id FROM asg a JOIN probes p ON a.cell = p.cell),
      |parts AS (SELECT e.vec_id,
      |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(q.qv[g.i] AS DOUBLE)) AS dot,
      |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(e.embedding[g.i] AS DOUBLE)) AS nd,
      |    sum(CAST(q.qv[g.i] AS DOUBLE) * CAST(q.qv[g.i] AS DOUBLE)) AS nq
      |  FROM embeddings e JOIN cand c2 ON e.vec_id = c2.vec_id, q, generate_series(1, 64) g(i)
      |  GROUP BY e.vec_id)
      |SELECT vec_id, CAST(round((dot / (sqrt(nd) * sqrt(nq))) * 1000000.0) AS BIGINT) AS cos_micro
      |FROM parts ORDER BY cos_micro DESC, vec_id ASC LIMIT 20""".stripMargin

  private val AnnIvfTopKSql: String = ivfOracleSql("")

  /** Oracle for q46 (streamed IVF): the centroid sample is drawn from the
    * BUILD slice only (vec_id < count/2 — the quantizer is frozen before
    * the stream starts), while assignment and probing cover the full
    * corpus including every streamed batch.
    */
  private val AnnIvfStreamedSql: String =
    ivfOracleSql("WHERE vec_id < (SELECT count(*) // 2 FROM embeddings)")

  // ---------- queries ----------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O3/O2: tokenize + per-doc field length (docstats table)
    "q01_doclen" -> ((s, dir) => IndexCache.documents(s, dir).docstats
      .select(col("doc_id"), element_at(col("fl"), 1).cast("long").as("field_len"))
      .orderBy("doc_id")),

    // O10: occurrence-counted document frequency (term dictionary)
    "q02_termdf" -> ((s, dir) => IndexCache.documents(s, dir).termdict
      .select(col("term"), col("df").cast("long")).orderBy("term")),

    // O4/O6: posting construction
    "q03_postings" -> ((s, dir) => IndexCache.documents(s, dir).postings
      .select(col("term"), col("doc_id"),
        element_at(col("tf"), 1).cast("long").as("tf"))
      .orderBy("term", "doc_id")),

    // O1 + FieldDetails: global stats
    "q04_fieldstats" -> ((s, dir) => IndexCache.documents(s, dir).docstats
      .agg(count(lit(1)).as("n_docs"),
        sum(element_at(col("fl"), 1)).cast("long").as("sum_len"))
      .select(col("n_docs"), col("sum_len"),
        micro(col("sum_len").cast("double") / col("n_docs").cast("double"))
          .as("avg_len_micro"))),

    // O14/O15/O18: full BM25, exact multi-term disjunction
    "q05_bm25_exact" -> ((s, dir) =>
      QueryEngine.query(IndexCache.documents(s, dir), "merge the data", BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")),

    // O13 + O18: prefix-expanded BM25 ("spar"→spark, "s"→6 terms)
    "q06_bm25_prefix" -> ((s, dir) =>
      QueryEngine.query(IndexCache.documents(s, dir), "spar s", BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")),

    // O13: term expansion
    "q07_expand" -> ((s, dir) =>
      QueryEngine.expandTerm(IndexCache.documents(s, dir), "s")),

    // O7: tombstoned remove (no vacuum) — stats/df recomputed live. The
    // tombstone set is a DataFrame end-to-end: no doc-id ever lands on the
    // driver (at 10^12 docs a collect() of the removal set would be 10^11
    // longs of driver heap).
    "q08_bm25_delete" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val tomb = idx.docstats.filter(col("doc_id") % 7 === 0).select("doc_id")
      QueryEngine.query(Mutations.removeDocuments(idx, tomb), "data table", BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")
    }),

    // O19: zero-to-one scorer. The general greedy finalize is a sequential
    // loop, but for THIS query ("spark merge" — prefix-disjoint terms) it
    // reduces EXACTLY to "per (doc, qti) take the max-score entry
    // (tiebreak: expanded term asc)": expansion sets of prefix-disjoint
    // query terms share no expanded term, so within a doc every entry's
    // node is unique — the df pool's first touch always consumes and no
    // pool is ever touched twice, leaving consumedQ as the only constraint.
    // That reduction is plain SQL; the full pool semantics stay pinned by
    // the reference golden vectors in GoldenZeroToOneSpec.
    "q09_zto" -> ((s, dir) =>
      QueryEngine.query(IndexCache.documents(s, dir), "spark merge", ZeroToOne())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")),

    // pipeline: exact dedup (with injected duplicates so groups exist)
    "q10_exact_dup" -> ((s, dir) => {
      val d = docs(s, dir)
      val aug = d.select(col("doc_id"), col("text")).union(
        d.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.exactDupGroups(aug, "doc_id", "text").orderBy("fingerprint")
    }),

    // pipeline: minhash signatures (portable md5 hash family)
    "q11_minhash" -> ((s, dir) =>
      Dedup.minhashSignatures(docs(s, dir), "doc_id", "text", 3, 8)
        .select(col("doc_id"), col("h").cast("long"), col("minhash"))
        .orderBy("doc_id", "h")),

    // pipeline: LSH banding candidate pairs
    "q12_lsh_pairs" -> ((s, dir) =>
      Dedup.lshCandidates(
        Dedup.minhashSignatures(docs(s, dir), "doc_id", "text", 3, 8), 2)
        .orderBy("id_a", "id_b")),

    // pipeline: 32-bit simhash
    "q13_simhash" -> ((s, dir) =>
      Dedup.simhash32(docs(s, dir), "doc_id", "text").orderBy("doc_id")),

    // pipeline: exact n-gram Jaccard near-dup pairs. maxBucket=200 passed
    // EXPLICITLY (library default stays 1000): hot-shingle pairs above 200
    // carry no dedup signal here and the cap bounds the self-join
    "q14_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", 3, 0.02, maxBucket = 200)
        .select(col("id_a"), col("id_b"), col("inter"),
          col("size_a"), col("size_b"), micro(col("jaccard")).as("jaccard_micro"))
        .orderBy("id_a", "id_b")),

    // pipeline: the SCALABLE Jaccard path — MinHash-LSH candidates, exact
    // Jaccard only on candidate pairs (sub-quadratic; q14 is the
    // exact-recall capped variant)
    "q29_jaccard_lsh" -> ((s, dir) =>
      Dedup.jaccardPairsViaLsh(docs(s, dir), "doc_id", "text", 3, 8, 2, 0.02)
        .select(col("id_a"), col("id_b"), col("inter"),
          col("size_a"), col("size_b"), micro(col("jaccard")).as("jaccard_micro"))
        .orderBy("id_a", "id_b")),

    // pipeline: embedding-cosine near-dup pairs — candidates share a
    // sign-LSH bucket (self-join on the bucket key, capped), exact cosine
    // on candidates. The threshold cut is applied on MICRO-UNIT scores on
    // both sides so sub-1e-6 f64 noise cannot flip boundary pairs.
    "q31_cos_neardup" -> ((s, dir) =>
      Similarity.cosineNearDups(emb(s, dir), "vec_id", "embedding", 64, 8,
        // all bucket pairs, threshold applied in micro units; cap disabled
        // because the ORACLE enumerates every same-bucket pair — the
        // operator's production default keeps the hot-bucket cap
        minCos = -1.0, maxBucket = Int.MaxValue)
        .select(col("id_a"), col("id_b"), micro(col("cos")).as("cos_micro"))
        .filter(col("cos_micro") >= 200000L)
        .orderBy("id_a", "id_b")),

    // pipeline: brute-force cosine similarity vs the vec_id=0 embedding
    "q15_cosine" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      e.select(col("vec_id"),
        micro(Similarity.cosine(col("embedding"),
          array(q.map(v => lit(v)): _*))).as("cos_micro"))
        .orderBy("vec_id")
    }),

    // pipeline: sign-LSH bucket assignment (the ANN scale path)
    "q16_lsh_buckets" -> ((s, dir) =>
      Similarity.lshBuckets(emb(s, dir), "vec_id", "embedding", 64, 8)
        .select(col("vec_id"), col("bucket").cast("long")).orderBy("vec_id")),

    // pipeline: quality scoring
    "q17_quality" -> ((s, dir) =>
      TextStats.qualityScores(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          micro(col("mean_tok_len")).as("mtl_micro"),
          micro(col("stopword_ratio")).as("stop_micro"),
          micro(col("alpha_ratio")).as("alpha_micro"),
          micro(col("quality")).as("quality_micro"))
        .orderBy("doc_id")),

    // pipeline: token counting (whitespace + BPE-ish regex)
    "q18_tokcounts" -> ((s, dir) =>
      TextStats.tokenCounts(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("ws_tokens").cast("long"),
          col("re_tokens").cast("long"))
        .orderBy("doc_id")),

    // pipeline: language-ID heuristic
    "q19_langid" -> ((s, dir) =>
      TextStats.languageId(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("lang_pred"),
          micro(col("hit_ratio")).as("ratio_micro"))
        .orderBy("doc_id")),

    // pipeline: document fingerprinting
    "q20_fingerprint" -> ((s, dir) =>
      TextStats.fingerprints(docs(s, dir), "doc_id", "text").orderBy("doc_id")),

    // pipeline: order-sensitive rolling-hash fingerprint
    "q27_rollhash" -> ((s, dir) =>
      TextStats.rollingFingerprints(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // pipeline: intra-document repetition signals (Gopher-family quality
    // rules): duplicate-line fraction + top-bigram coverage, all row-local
    // and codegen'd. DuckDB recomputes the bigram mode with an
    // unnest+group plan; the Spark side uses a sort+run-length fold — two
    // independent algorithms, same numbers, micro-unit gated
    // (the corpus is single-line and its lines never duplicate naturally,
    // so the gate synthesizes line structure deterministically: every
    // " a " becomes a newline — same plain leftmost-non-overlapping
    // replace in both engines — and every third doc gets its FIRST line
    // appended again, so the duplicate-line fraction is a real varying
    // signal, not uniformly zero)
    "q47_repetition" -> ((s, dir) => {
      val repl = regexp_replace(col("text"), " a ", "\n")
      val lined = when(col("doc_id") % 3 === 0,
        concat(repl, lit("\n"), element_at(split(repl, "\n"), 1)))
        .otherwise(repl)
      TextStats.repetitionStats(
        docs(s, dir).select(col("doc_id"), lined.as("text")),
        "doc_id", "text")
        .select(col("doc_id"), col("n_lines"),
          micro(col("dup_line_frac")).as("dup_micro"),
          col("top_bigram_n"),
          micro(col("top_bigram_frac")).as("top_bg_micro"))
        .orderBy("doc_id")
    }),

    // pipeline: PII/contact redaction. The corpus carries no PII, so the
    // gate injects deterministic emails/URLs/IPs (plain string concat,
    // identical in both engines) and checks counts AND the rewritten text
    // byte-for-byte. Patterns live in the java-regex ∩ RE2 dialect subset
    // so the oracle runs them verbatim.
    "q48_redact" -> ((s, dir) => {
      val salted = concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" see https://ex.org/p"), col("doc_id"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" from 10.0."), col("doc_id") % 256, lit(".1")))
          .otherwise(lit("")))
      TextStats.redactPii(
        docs(s, dir).select(col("doc_id"), salted.as("text")),
        "doc_id", "text").orderBy("doc_id")
    }),

    // north_star "expanded/FUZZY term matching": BM25 with Levenshtein-1
    // expansion, served from the PERSISTED deletion-variant table
    // (IndexCatalog.buildFuzzy — O(len(q)) partition-pruned point lookups,
    // never a vocabulary levenshtein scan). "sart" expands to {sort, part}
    // (one substitution each — unreachable by prefix semantics), "scan" to
    // itself (exact ⇒ boost 1), "kay" to {key}. The oracle recomputes the
    // expansion with DuckDB's levenshtein and the same edit-distance boost,
    // so a candidate lost by the variant probe OR a boost drift breaks the
    // hash.
    "q49_bm25_fuzzy" -> ((s, dir) => {
      val (idx, root) = IndexCache.documentsFuzzyPersisted(s, dir)
      QueryEngine.queryFuzzyPersisted(idx, root, "sart scan kay", BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")
    }),

    // pipeline: benchmark decontamination (GPT-3/Pile-style n-gram
    // overlap). The "benchmark set" is the deterministic doc_id % 37 = 0
    // slice of the corpus itself, so every doc in that slice is 100%
    // contaminated and the rest carry a real varying overlap signal
    // (shared 3-shingles of a 31-term vocabulary). The oracle recomputes
    // both shingle sets and the overlap with an independent unnest+join
    // plan.
    "q50_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contamination(d, "doc_id", "text",
        d.filter(col("doc_id") % 37 === 0), "text")
        .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
          micro(col("contam_frac")).as("contam_micro"))
        .orderBy("doc_id")
    }),

    // pipeline: deterministic stratified sampling for data mixing — keep
    // iff the first 60 bits of md5('mix:'||doc_id) fall under the
    // stratum's rate threshold (source srcK sampled at K/20). A pure
    // map-side codegen'd filter; the oracle recomputes the identical
    // draw+threshold, so ANY divergence in the kept set (the property
    // that makes the mixture reproducible) breaks the hash.
    "q51_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(docs(s, dir), "doc_id", "source",
        SampleRates)
        .select(col("doc_id"), col("source")).orderBy("doc_id")),

    // pipeline: greedy sequence packing into 64-token context windows,
    // one pack stream per source shard. The oracle replays the identical
    // first-fit walk as a recursive CTE (an independent sequential
    // formulation), so any divergence in pack boundaries, positions, or
    // the oversize flag breaks the hash. Budget 64 sits inside the
    // corpus's 10–99 token range, exercising BOTH branches: multi-doc
    // packs and oversize single-doc packs.
    "q52_seq_packing" -> ((s, dir) =>
      Packing.packGreedy(docs(s, dir), "doc_id", "text", "source", budget = 64)
        .select(col("shard"), col("doc_id"), col("n_tokens").cast("long"),
          col("pack_id"), col("pack_pos"),
          col("oversize").cast("int").cast("long").as("oversize"))
        .orderBy("shard", "doc_id")),

    // FILTERED SEARCH (predicate + top-k, the facet production shape):
    // BM25 with corpus-level stats, results restricted to three sources
    // via a docFilter semi-join applied before scoring — through the WAND
    // block path, so the θ-probe must seed from allowed docs only (a θ
    // from a disallowed doc could over-prune; this gate would catch it).
    // Oracle = full-corpus BM25 SQL with the identical doc_id IN restriction.
    "q53_bm25_filtered" -> ((s, dir) => {
      val allowed = docs(s, dir)
        .filter(col("source").isin("src1", "src3", "src5"))
        .select(col("doc_id"))
      val idx = IndexCache.documents(s, dir)
      graft.query.BlockMaxTopK.query(idx, IndexCache.blocks(s, dir),
        "spar merge", BM25(), k = 200, blockSize = IndexCache.BlockSize,
        docFilter = Some(allowed))
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // CONJUNCTIVE (AND) matching — the reference is disjunction-only; AND
    // is realized as filtered search with a derived filter (docs matching
    // ≥1 expansion of EVERY query term), composed through the WAND block
    // path. The oracle recomputes the same match-all set with a HAVING
    // count(DISTINCT qti) clause, so a doc matching only "spar" or only
    // "merge" appearing in the result breaks rows, and any scoring drift
    // breaks the hash.
    "q55_bm25_conjunctive" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val matchAll = QueryEngine.conjunctiveFilter(idx, "spar merge")
      graft.query.BlockMaxTopK.query(idx, IndexCache.blocks(s, dir),
        "spar merge", BM25(), k = 200, blockSize = IndexCache.BlockSize,
        docFilter = Some(matchAll))
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // BOOLEAN NOT (exclusion) — the third boolean leg (OR is the default,
    // AND is q55): "spar merge" NOT "window", the exclusion realized as a
    // derived docFilter (match set anti-join) through the WAND block path.
    // The exclusion binds hard at sf0.01 (465 matching docs → 95 after
    // NOT), so a filter applied too late (after the top-k cut) or dropped
    // breaks rows, and θ leaking from an excluded doc would over-prune.
    // Oracle = the same lossless-top-k SQL with the identical
    // NOT IN (prefix match set) restriction.
    "q64_bm25_not" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val allowed = QueryEngine.exclusionFilter(idx, "spar merge", "window")
      graft.query.BlockMaxTopK.query(idx, IndexCache.blocks(s, dir),
        "spar merge", BM25(), k = 200, blockSize = IndexCache.BlockSize,
        docFilter = Some(allowed))
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // SCORE EXPLANATION — the "why does this doc rank here" breakdown for
    // the top-20 docs of "spar merge": per (doc, query term) the winning
    // expansion and its contribution (Σ contributions == the doc's BM25
    // score — the merge rule made visible). The top-20 doc SET is cut by
    // (micro score desc, doc_id asc) over the FULL result on both sides —
    // the oracle's own rule, no lossless-cut assumption — and the
    // winning-expansion argmax is micro-rounded with term-asc ties, so the
    // hash pins the full breakdown: a wrong idf, boost, or tf-norm in any
    // single expansion flips best_term or term_score_micro.
    "q65_explain" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val top = QueryEngine.query(idx, "spar merge", BM25())
        .select(col("doc_id"), micro(col("score")).as("sm"))
        .orderBy(col("sm").desc, col("doc_id").asc).limit(20)
        .select(col("doc_id"))
      QueryEngine.explain(idx, "spar merge", BM25(), docFilter = Some(top))
        .select(col("doc_id"), col("qti"), col("qterm"), col("best_term"),
          micro(col("term_score")).as("term_score_micro"))
        .orderBy(col("doc_id").asc, col("qti").asc)
    }),

    // SYNONYM expansion — "spar merge" with merge ≡ join: both variants
    // share query-term slot 1, so a doc containing only "join" now
    // matches, and a doc containing both scores max(merge, join) for the
    // slot — NOT the sum (a sum-shaped bug inflates every both-variant
    // doc's hash). The synonym binds hard: "join" is the corpus's hottest
    // term, so the match set grows vs q05's and the added docs carry
    // join-derived scores the oracle recomputes independently.
    "q67_synonyms" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.synonymQuery(idx, "spar merge",
          Map("merge" -> Seq("join")), BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("doc_id"))
    }),

    // MINIMUM-SHOULD-MATCH — "spar merge slow" with m = 2: docs matching at
    // least 2 of the 3 query-term slots, the standard OR/AND middle ground,
    // realized as a derived docFilter through the WAND block path. The
    // threshold binds three ways at sf0.01: m=1 admits single-term docs,
    // m=3 (AND) drops two-of-three docs — so an off-by-one in the HAVING
    // comparison or a filter dropped on the WAND path breaks rows. Oracle =
    // the same lossless-top-k SQL with count(DISTINCT qti) >= 2.
    "q68_bm25_minmatch" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val allowed = QueryEngine.minMatchFilter(idx, "spar merge slow", 2)
      graft.query.BlockMaxTopK.query(idx, IndexCache.blocks(s, dir),
        "spar merge slow", BM25(), k = 200, blockSize = IndexCache.BlockSize,
        docFilter = Some(allowed))
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // REGEX term search — grep over the dictionary, then the ordinary
    // scoring pipeline: '^s[a-z]+a[a-z]+$' matches {scan, small, spark,
    // stream} at sf0.01, each an exact-scored variant (boost 1.0) under ONE
    // slot, per-(doc, slot) max-merged — a doc containing both "scan" and
    // "stream" scores max, not sum. The pattern is in the java ∩ RE2
    // dialect so Spark and DuckDB agree verbatim; the oracle computes the
    // variant set independently via regexp_matches over the term relation
    // and scores with exact (term =) expansion join.
    "q69_bm25_regex" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.regexQuery(idx, "^s[a-z]+a[a-z]+$", BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("doc_id"))
    }),

    // SHARD MERGE — the 100-TB build topology under the gate: the corpus is
    // split by doc-id parity, each half indexed INDEPENDENTLY, the two
    // shard indexes merged relationally (postings/docstats union, termdict
    // df re-SUM), and the merged index queried. The oracle scores the FULL
    // corpus in one pass — so a df double-count, a missed union leg, or
    // stats folded wrong shifts every idf/avgdl and breaks the hash.
    "q70_shard_merge" -> ((s, dir) => {
      val idx = IndexCache.documentsMergedInMemory(s, dir)
      QueryEngine.query(idx, "window key", BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("doc_id"))
    }),

    // PERSISTED SHARD MERGE — two independently BUILT catalog roots (doc-id
    // parity split) merged file-level (postings/docstats copies under the
    // shared bucket dirs + one vocab-sized df re-sum + a one-row stats
    // fold), blocks built over the merged store, WAND served from it. The
    // oracle scores the full corpus in one pass — a missed shard file, a
    // doubled df, or a mis-folded N/avgdl breaks the hash.
    "q71_persisted_merge" -> ((s, dir) => {
      val (idx, blocks, bs, rpg) = IndexCache.documentsShardMerged(s, dir)
      graft.query.BlockMaxTopK.query(idx, blocks, "table row", BM25(),
        k = 200, blockSize = bs, rangesPerGroup = rpg)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // SEARCH-AFTER (cursor pagination) — PAGE 2 of "spar merge" at page
    // size 20: page 1's last row becomes the cursor, and the page-2 rows
    // must be exactly ranks 21–40 of the full (micro score desc, doc_id
    // asc) order — the oracle recomputes them as LIMIT 20 OFFSET 20 over
    // the same total order, so a cursor predicate that overlaps page 1,
    // skips a tied doc, or breaks ties differently shifts the whole page
    // and breaks the hash.
    "q66_search_after" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val page1 = QueryEngine.searchAfter(idx, "spar merge", BM25(),
        Long.MaxValue, Long.MinValue, 20)
        .select(micro(col("score")).as("sm"), col("doc_id")).collect()
      val cursor = page1.last
      QueryEngine.searchAfter(idx, "spar merge", BM25(),
        cursor.getLong(0), cursor.getLong(1), 20)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
    }),

    // FILTERED ANN over the persisted vector index: candidates are
    // partition-pruned to the probe buckets FIRST, then semi-joined with
    // the allowed set (odd labels) — the oracle applies the identical
    // label predicate at the same point, so a filter applied too early
    // (changing the probe set) or too late (after the top-k cut) breaks
    // the hash.
    "q54_ann_filtered" -> ((s, dir) => {
      val root = IndexCache.vectorsPersisted(s, dir)
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val allowed = e.filter(col("label") % 2 === 1).select(col("vec_id"))
      graft.index.VectorIndex.probeCandidates(s, root, q,
        filter = Some(allowed))
        .select(col("vec_id"), micro(col("cos")).as("cos_micro"))
        .orderBy(col("cos_micro").desc, col("vec_id").asc)
        .limit(20)
    }),

    // PERCOLATION (reverse search / alerting): which registered queries
    // match each document — conjunctive prefix matching compiled into ONE
    // map-only codegen'd expression (no index, no shuffle, no state;
    // stream-safe, pinned by PercolatorSpec). Oracle: per-query UNION ALL
    // of the same forall-terms prefix rule.
    "q63_percolate" -> ((s, dir) =>
      graft.query.Percolator.percolate(docs(s, dir), "doc_id", Seq("text"),
        Seq(1L -> "spar merge", 2L -> "table", 3L -> "slow key window"))
        .orderBy("doc_id", "qid")),

    // SPAN-LEVEL dedup signal (Lee et al. 2022 shape): per doc, how many
    // of its 8-token windows are shared verbatim with another doc. One
    // explode + hash-groupBy (no self-join); the oracle recomputes the
    // identical md5 span keys and the distinct-doc duplicate rule.
    "q62_span_dedup" -> ((s, dir) =>
      graft.pipeline.Dedup.spanDupStats(docs(s, dir), "doc_id", "text",
        n = 8)
        .orderBy("doc_id")),

    // FACET COUNTS over a query's match set (the results-page sidebar):
    // one pruned posting scan → distinct match set → semi-join into the
    // (id, facet) projection → one narrow groupBy. Oracle recomputes the
    // match set (any expansion of any term) and counts per source.
    "q60_facets" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.facetCounts(idx, docs(s, dir), "doc_id", "source",
        "spar merge")
        .select(col("facet"), col("n_docs").cast("long").as("n_docs"))
    }),

    // MORE-LIKE-THIS: the seed doc's tf-idf top-5 terms become the query
    // (rank order = qti order, so the score fold matches), seed excluded.
    // The oracle recomputes term salience (occ × BM25 idf, the identical
    // f64 product), the rank cut, and the full scoring pipeline in SQL —
    // a drifted salience weight or a mis-ranked term changes the query
    // itself and breaks everything downstream.
    "q61_more_like_this" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.moreLikeThis(idx, docId = 3L, BM25(), topTerms = 5,
        limit = 200)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // SPELLING SUGGESTION ("did you mean"): per input term, the dictionary
    // term within Levenshtein 1 ranked (edit distance asc, df desc, term
    // asc) — an exact hit ("spark") must suggest itself. Oracle recomputes
    // the dictionary + ranking from scratch with DuckDB's levenshtein.
    "q59_suggest" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.suggest(idx, Seq("tble", "windw", "merg", "spark"))
        .orderBy("qterm")
    }),

    // SNIPPET generation (hit highlighting): best 8-token window per doc
    // by query-term occurrence count, earliest wins ties — one map-only
    // codegen'd pass (SnippetSpec pins the no-Exchange plan). The oracle
    // replays the identical rule with DuckDB list lambdas, so an off-by-
    // one in the window walk or a tie broken late breaks the hash.
    "q58_snippets" -> ((s, dir) =>
      graft.query.Snippets.snippets(docs(s, dir), "doc_id", "text",
        Seq("spark", "merge"), window = 8)
        .orderBy("doc_id")),

    // BATCHED multi-query search: three queries (different term counts,
    // one shared term) scored in ONE pass — one dictionary resolve, one
    // pruned posting scan, one (qid, doc_id)-keyed shuffle. Oracle = the
    // per-query BM25 SQL, one UNION ALL branch per query, so any cross-
    // query bleed (wrong qid on a row, a shared term's expansion applied
    // to the wrong query) breaks rows/hash. Engine over-fetches (k=50 on
    // raw doubles) then cuts to 10 in micro units — the same tie-stable
    // cut discipline as every top-k gate.
    "q57_bm25_batch" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
      QueryEngine.batchQuery(idx, Seq(1L -> "spar merge", 2L -> "table",
        3L -> "slow key window"), BM25(), k = 50)
        .select(col("qid"), col("doc_id"), micro(col("score")).as("score_micro"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .drop("rn")
        .orderBy(col("qid").asc, col("score_micro").desc, col("doc_id").asc)
    }),

    // PHRASE search (exact adjacent token sequence), two-phase match+verify
    // (no positional postings): exact-term conjunctive candidates from the
    // index, adjacency verified on the candidates' raw text via the padded
    // space-join — then scored through the WAND block path as a docFilter.
    // The oracle recomputes adjacency INDEPENDENTLY (canonical token stream
    // LIKE '% merge group %'), so a candidate that has both terms NON-
    // adjacent leaking through breaks rows, and scoring drift breaks hash.
    "q56_bm25_phrase" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val pf = QueryEngine.phraseFilter(idx, docs(s, dir), "doc_id",
        Seq("text"), "merge group")
      graft.query.BlockMaxTopK.query(idx, IndexCache.blocks(s, dir),
        "merge group", BM25(), k = 200, blockSize = IndexCache.BlockSize,
        docFilter = Some(pf))
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // pipeline: multimodal decode — REAL header parsing end-to-end: the
    // corpus text is encoded into genuine PNG / header-accurate JPEG blobs
    // (MediaCodec; dims derived from the first two text bytes) and
    // decodeFeatures parses the actual IHDR / SOF0 bytes back. DuckDB
    // recomputes the expected metadata from the text (valid because the
    // corpus is pure ASCII, so UTF-8 byte k == character k's code point)
    // — a dims-parse bug on either side breaks the hash
    // feature_src is part of the gated output (round-4 verdict #8): the
    // even-length texts become real gray PNGs decoded by the native pixel
    // path ("png-pixels"), the odd ones header-only JPEG stubs that fall
    // back to the byte histogram ("bytes") — a silent regression of the
    // pixel decoder to the fallback now breaks the hash
    "q21_multimodal" -> ((s, dir) =>
      Multimodal.decodeFeatures(
        Multimodal.syntheticMedia(docs(s, dir), "doc_id", "text"),
        "doc_id", "media")
        .select(col("doc_id"), col("n_bytes"), col("format"), col("width"),
          col("height"), col("feature_src"))
        .orderBy("doc_id")),

    // pipeline: LSH-restricted approximate cosine top-k. Oracle-checked:
    // DuckDB computes the identical sign-LSH buckets (proven by q16), the
    // same 1-bit multiprobe set, exact cosine, and the same top-20. The
    // cut is taken on MICRO-UNIT scores with a doc-id tiebreak on BOTH
    // sides so sub-1e-6 cross-engine f64 noise can't flip the boundary.
    "q22_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Similarity.lshProbeCandidates(e, "vec_id", "embedding", 64, 8, q)
        .select(col("vec_id"), micro(col("cos")).as("cos_micro"))
        .orderBy(col("cos_micro").desc, col("vec_id").asc)
        .limit(20)
    }),

    // pipeline: dedup as a transform — surviving doc ids after dropping
    // exact (normalized) duplicates from the dup-injected corpus
    "q25_dedup_survivors" -> ((s, dir) => {
      val d = docs(s, dir)
      val aug = d.select(col("doc_id"), col("text")).union(
        d.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.dropExactDups(aug, "doc_id", "text")
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // streaming: watermarked 5-minute tumbling-window aggregation over the
    // events stream, driven to completion with AvailableNow (a REAL
    // streaming query — readStream/watermark/window/memory sink)
    "q26_stream_window" -> ((s, dir) =>
      graft.streaming.EventWindows
        .runAvailableNow(s, s"$dir/events.parquet")
        // string-typed window edge: timestamp tz-representation differs
        // between engines' parquet/pandas round trips
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("event_type"), col("n"), col("sum_value_c"))
        .orderBy("window_start", "event_type")),

    // input_hint per-row invariant: content sha256 equality vs the source
    "q23_sha" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), sha2(col("text"), 256).as("sha"))
        .orderBy("doc_id")),

    // multi-field BM25 with per-field boosts: two indexed fields
    // (text boost 1.0, source boost 2.0), per-field length normalization
    // against per-field averages, and prefix expansion hitting the SECOND
    // field ("src1" → src1, src10..src19)
    "q30_bm25_multifield" -> ((s, dir) =>
      QueryEngine.query(IndexCache.documentsMulti(s, dir), "merge src1",
        BM25(), boosts = Seq(1.0, 2.0))
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")),

    // zero-to-one under block-max WAND (scorer-generic pruning via the
    // entscore/qlen bound): same tie-stable micro-unit top-20 cut as q24,
    // oracle = the q09 prefix-disjoint reduction re-ranked and cut
    "q32_zto_wand" -> ((s, dir) =>
      graft.query.BlockMaxTopK.query(IndexCache.documents(s, dir),
        IndexCache.blocks(s, dir), "spark merge", ZeroToOne(), k = 200,
        blockSize = IndexCache.BlockSize)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)),

    // tokenizer SPI end-to-end: index built with the CODE tokenizer
    // (identifiers / numbers / single punctuation marks), query tokenized
    // with the matching driver-side tokenizer — "merge dat ." carries a
    // punctuation term no whitespace split could isolate, plus a prefix
    // expansion ("dat")
    "q28_bm25_codetok" -> ((s, dir) =>
      QueryEngine.query(IndexCache.documentsCode(s, dir), "merge dat .", BM25(),
        tokenizer = graft.analysis.Analyzer.codeTokenizeRaw)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")),

    // block-max WAND top-k over compressed posting blocks. Blocks come
    // from the per-dir cache (built once — BlockMaxTopK runs 3 actions
    // over them). Oracle-checked: the WAND result is exact (pruning is
    // lossless), so DuckDB's exhaustive BM25 top-k is the oracle; the
    // top-20 cut is re-ranked on micro-unit scores with a doc-id tiebreak
    // on BOTH sides (tie-stable), with a 10× double-rank margin (k=200) so
    // every micro-rank-20 doc is inside the WAND result unless >180 docs
    // sit within 1e-6 of the cut — exact ties are always safe (same
    // doc-id tiebreak both sides); only that dense-near-tie pathology
    // could differ.
    "q24_wand" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      graft.query.BlockMaxTopK.query(idx, IndexCache.blocks(s, dir),
        "spar merge", BM25(), k = 200, blockSize = IndexCache.BlockSize)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // the PERSISTED catalog under the gate: manifest read, termdict prefix
    // resolution, bucket-partition-pruned posting scan (the deployment-
    // shape plan — the other BM25 queries run over the in-memory cached
    // index). "filt" prefix-expands through the persisted dictionary.
    "q33_bm25_persisted" -> ((s, dir) =>
      QueryEngine.query(IndexCache.documentsPersisted(s, dir), "spark filt",
        BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")),

    // the incremental-append protocol under the gate: build on doc_id%3!=0,
    // addDocuments the remainder (staged delta + generation-dir publish),
    // query the result — the oracle is the FULL corpus, so any append
    // artifact (df drift, missing postings, stale stats) breaks the hash
    "q34_bm25_append" -> ((s, dir) =>
      QueryEngine.query(IndexCache.documentsAppended(s, dir), "data table",
        BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")),

    // zero-to-one with OVERLAPPING expansion sets ("s" expands over 6 terms
    // including "spark"; "spark" expands to itself): the greedy finalize's
    // per-node df pool genuinely decrements — docs whose only s-term is
    // spark score differently for tf=1 (pool exhausted, second query term
    // unconsumed) vs tf≥2. Oracle = the exact 2-query-term closed form of
    // the greedy loop (see the q35 oracle comment); the reduction itself is
    // fuzz-pinned against the real loop by ZtoPoolProps.
    "q35_zto_pool" -> ((s, dir) =>
      QueryEngine.query(IndexCache.documents(s, dir), "s spark", ZeroToOne())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")),

    // block-max WAND over the PERSISTED block table (IndexCatalog
    // buildBlocks stage + readBlocks, parquet round trip) against the
    // persisted index — the full deployment-shape WAND stack under the
    // gate; q24 is the same query over the in-memory caches, so the same
    // exhaustive oracle applies (pruning is lossless)
    "q37_wand_persisted" -> ((s, dir) => {
      val idx = IndexCache.documentsPersisted(s, dir)
      val (blocks, bs, rpg) = IndexCache.blocksPersisted(s, dir)
      graft.query.BlockMaxTopK.query(idx, blocks, "spar merge", BM25(),
        k = 200, blockSize = bs, rangesPerGroup = rpg)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // the incremental block-maintenance lifecycle (build → buildBlocks →
    // append → buildBlocks-as-O(delta)-fold → WAND): oracle = exhaustive
    // BM25 over the FULL corpus with the q24-style tie-stable top-20 cut,
    // so a missed delta range or double-folded posting breaks the hash
    "q43_wand_append_fold" -> ((s, dir) => {
      val (idx, blocks, bs, rpg) = IndexCache.documentsAppendedBlocks(s, dir)
      graft.query.BlockMaxTopK.query(idx, blocks, "spar merge", BM25(),
        k = 200, blockSize = bs, rangesPerGroup = rpg)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // pipeline: IVF coarse-quantizer ANN — the data-adaptive alternative
    // to q22's sign-LSH path. Deterministic hash-sampled centroids (16
    // cells), codegen'd nearest-centroid assignment (one narrow corpus
    // scan, no join/shuffle), probe the 4 cells nearest the query, exact
    // cosine inside. Oracle recomputes the identical sample / argmax
    // assignment / probe ranking in SQL; same tie-stable micro-unit
    // top-20 cut as q22/q36.
    "q44_ann_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Similarity.ivfProbeCandidates(e, "vec_id", "embedding", 16, 4, q)
        .select(col("vec_id"), micro(col("cos")).as("cos_micro"))
        .orderBy(col("cos_micro").desc, col("vec_id").asc)
        .limit(20)
    }),

    // the PERSISTED IVF index: same quantizer / probe ranking / exact
    // cosine as q44, but served from the cell-partitioned IvfIndex — the
    // probe scan reads only the 4 probe-cell partitions (pruning asserted
    // by IvfIndexSpec) and the centroid table from the manifest dir,
    // never recomputing the sample or assignment over the corpus. Same
    // tie-stable micro-unit top-20 cut; oracle shared with q44 (identical
    // by construction — parity is the point of the gate).
    "q45_ann_ivf_persisted" -> ((s, dir) => {
      val root = IndexCache.ivfPersisted(s, dir)
      val q = emb(s, dir).filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      graft.index.IvfIndex.probeCandidates(s, root, q, nProbe = 4)
        .select(col("vec_id"), micro(col("cos")).as("cos_micro"))
        .orderBy(col("cos_micro").desc, col("vec_id").asc)
        .limit(20)
    }),

    // STREAMED IVF ingestion under the gate: half the corpus seeds the
    // index (freezing the centroid sample), the rest arrives as file
    // micro-batches through StreamingVectorIndexer's exactly-once append
    // protocol. The oracle samples centroids from the build slice but
    // assigns and probes the FULL corpus — a dropped/duplicated batch or
    // a re-trained quantizer breaks the hash. Same tie-stable micro-unit
    // top-20 cut.
    "q46_ann_ivf_streamed" -> ((s, dir) => {
      val root = IndexCache.ivfStreamed(s, dir)
      val q = emb(s, dir).filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      graft.index.IvfIndex.probeCandidates(s, root, q, nProbe = 4)
        .select(col("vec_id"), micro(col("cos")).as("cos_micro"))
        .orderBy(col("cos_micro").desc, col("vec_id").asc)
        .limit(20)
    }),

    // the PERSISTED ANN index: same hash family / multiprobe set / exact
    // cosine as q22, but served from the bucket-partitioned VectorIndex —
    // the probe scan reads only the ≤9 probe-bucket partitions (pruning
    // asserted by VectorIndexSpec) instead of recomputing sign-LSH over
    // the corpus per query. Same tie-stable micro-unit top-20 cut.
    "q36_ann_persisted" -> ((s, dir) => {
      val root = IndexCache.vectorsPersisted(s, dir)
      val q = emb(s, dir).filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      graft.index.VectorIndex.probeCandidates(s, root, q)
        .select(col("vec_id"), micro(col("cos")).as("cos_micro"))
        .orderBy(col("cos_micro").desc, col("vec_id").asc)
        .limit(20)
    }),

    // the persisted delete → vacuum → rebuilt-blocks → WAND lifecycle
    // under the gate (round-3 verdict #1): tombstones are a DataFrame
    // end-to-end (IndexCatalog.removeDocuments(root, ids: DataFrame)),
    // vacuum compacts + rewrites termdict/fieldstats, buildBlocks runs
    // over the COMPACTED postings, and the query answers through the
    // persisted WAND stack. Oracle = exhaustive BM25 over the filtered
    // corpus with the q24-style tie-stable top-20 cut.
    "q38_bm25_vacuum" -> ((s, dir) => {
      val (idx, blocks, bs, rpg) = IndexCache.documentsVacuumed(s, dir)
      graft.query.BlockMaxTopK.query(idx, blocks, "spar table", BM25(),
        k = 200, blockSize = bs, rangesPerGroup = rpg)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // streaming ingestion under the gate: three micro-batches of appends
    // through StreamingIndexer (readStream → foreachBatch → crash-safe
    // addDocuments), then a prefix query over the persisted result;
    // oracle = full-corpus BM25
    "q39_bm25_streamed" -> ((s, dir) =>
      QueryEngine.query(IndexCache.documentsStreamed(s, dir), "merge s",
        BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")),

    // the UNBOUNDED-expansion fallback plan under the gate: with
    // maxCollectedExpansions=1 the "s" prefix (6 expansions) overflows the
    // collect cap, so the posting scan runs the non-collected
    // `startsWith`-predicate plan (QueryEngine's DataFrame fallback, the
    // reference's unbounded expand_term semantics) — over the PERSISTED
    // index, where that plan cannot partition-prune. Same scores as the
    // collected plan by construction; oracle = the same SQL pipeline.
    "q40_bm25_scanexp" -> ((s, dir) =>
      QueryEngine.query(IndexCache.documentsPersisted(s, dir), "s merge",
        BM25(), maxCollectedExpansions = 1)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")),

    // the transitive-closure tail of the near-dup pipeline: MinHash-LSH
    // candidate pairs (jaccard ≥ 0.5) over the dup-injected corpus →
    // connected components (iterative hash-min + pointer jumping) →
    // (id, component = min reachable id). Oracle = the same pair SQL plus
    // a recursive-CTE reachability min — an independent algorithm, so a
    // propagation bug (stale label, missed hop) breaks the hash.
    "q42_neardup_components" -> ((s, dir) => {
      val d = docs(s, dir)
      val aug = d.select(col("doc_id"), col("text")).union(
        d.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val pairs = Dedup.jaccardPairsViaLsh(aug, "doc_id", "text", 3, 8, 2, 0.5)
        .select("id_a", "id_b")
      Dedup.components(pairs).orderBy("id")
    }),

    // the PRODUCTION-CAPPED cosine near-dup path (q31 disables the
    // hot-bucket cap for its oracle; here the cap is ENGAGED and binding —
    // sf0.01 has buckets of size 7..10 — and the oracle applies the same
    // per-bucket rule: only buckets with 2..6 members generate pairs)
    "q41_cos_neardup_capped" -> ((s, dir) =>
      Similarity.cosineNearDups(emb(s, dir), "vec_id", "embedding", 64, 8,
        minCos = -1.0, maxBucket = 6)
        .select(col("id_a"), col("id_b"), micro(col("cos")).as("cos_micro"))
        .filter(col("cos_micro") >= 200000L)
        .orderBy("id_a", "id_b")),

    // HYBRID SEARCH (reciprocal-rank fusion): the BM25 top list and the
    // embedding-cosine top list (vec_id ≡ doc_id at this sf) fused as
    // Σ 1/(60 + rank), ranks taken over MICRO-unit scores with the doc_id
    // tiebreak so both engines rank identically; the fused reciprocals are
    // exactly-representable f64s, so the sum is bit-equal cross-engine.
    // The oracle recomputes both lists, both rankings, and the fusion from
    // scratch — a rank off by one anywhere shifts a reciprocal and breaks
    // the hash.
    "q72_hybrid_rrf" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val lex = QueryEngine.query(idx, "spar merge", BM25())
        .select(col("doc_id"), micro(col("score")).as("m"))
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      // the vector list is CUT to the fusion depth before rrf — identical
      // result (rrf drops ranks > maxRank anyway, same order) but the
      // global-order window then sees 100 rows by construction instead of
      // the corpus (the scale contract in Fusion.rrf's scaladoc)
      val vec = e.select(col("vec_id").as("doc_id"),
        micro(Similarity.cosine(col("embedding"),
          array(q.map(v => lit(v)): _*))).as("m"))
        .orderBy(col("m").desc, col("doc_id").asc).limit(100)
      graft.query.Fusion.rrf(Seq(lex, vec), "doc_id", "m",
        rrfK = 60, maxRank = 100, topK = 20)
        .select(col("doc_id"), micro(col("rrf")).as("rrf_micro"))
        .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    }),

    // FIELD COLLAPSE (best hit per group — "one result per repo"): the
    // BM25 match set collapsed to each source's top doc by
    // (score_micro desc, doc_id asc). Oracle recomputes the match set and
    // the per-group argmax with a window over the same keys — a wrong
    // group winner or a tie broken differently changes rows.
    "q73_collapse" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val res = QueryEngine.query(idx, "spar merge", BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
      graft.query.Fusion.collapseTop(res, docs(s, dir), "doc_id", "source",
        "score_micro")
        .select(col("doc_id"), col("source"), col("score_micro"))
        .orderBy("doc_id")
    }),

    // FUNCTION SCORE (multiplicative modifier): BM25 × a length-decay
    // prior 1000/(1000 + n_chars) — pure rational f64 arithmetic, so both
    // engines compute the identical factor; the product is rounded to
    // micro at the same composition point on both sides (raw score ×
    // factor, then round).
    "q74_func_score" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val res = QueryEngine.query(idx, "spar merge", BM25())
      graft.query.Fusion.functionScore(res, docs(s, dir), "doc_id",
        Seq("n_chars"), "score",
        lit(1000.0) / (lit(1000L) + col("n_chars")))
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")
    }),

    // TWO-PHASE RESCORING: BM25 top-50 window, blended with the
    // embedding-cosine signal as 1·bm25_micro + 2·cos_micro — exact LONG
    // arithmetic on both sides (no float drift possible), so window
    // membership, the blend, and the final cut must all agree for the
    // hash to match. The expensive signal touches only the 50-doc window.
    "q75_rescore" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val lex = QueryEngine.query(idx, "spar merge", BM25())
        .select(col("doc_id"), micro(col("score")).as("m"))
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val sec = e.select(col("vec_id").as("doc_id"),
        micro(Similarity.cosine(col("embedding"),
          array(q.map(v => lit(v)): _*))).as("cos_m"))
      graft.query.Fusion.rescore(lex, "doc_id", "m", sec, "cos_m",
        windowSize = 50, queryWeight = lit(1L), rescoreWeight = lit(2L),
        topK = 20)
        .select(col("doc_id"), col("blended").as("blended_micro"))
        .orderBy(col("blended_micro").desc, col("doc_id").asc)
    }),

    // WILDCARD term search — the Lucene/ES wildcard query: '?' = one char,
    // '*' = any run; 's?a*' matches {scan, small, spark} at sf0.01, each an
    // exact-scored variant under ONE slot (wildcard → anchored regex over
    // the dictionary, the q69 machinery). The oracle recomputes the variant
    // set with SQL LIKE ('?'→'_', '*'→'%') — two INDEPENDENT pattern
    // dialects must produce the same term set for the hash to match.
    "q76_bm25_wildcard" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.wildcardQuery(idx, "s?a*", BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("doc_id"))
    }),

    // PER-TERM query boosts — "s^2.5 merge^0.5 key": slot 0 ("s", SIX
    // prefix expansions) weighted 2.5, slot 1 halved, slot 2 unweighted
    // (no caret). The weight multiplies the expansion boost before scoring
    // (max(w·s) = w·max(s), so the per-slot max-merge is unchanged); the
    // oracle multiplies at the same composition point (esc CTE) and scores
    // the full pipeline independently.
    "q77_bm25_boosted" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.boostedQuery(idx, "s^2.5 merge^0.5 key", BM25())
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("doc_id"))
    }),

    // SLOPPY PHRASE (ordered proximity): "merge … group" with ≤ 2
    // intervening tokens, through the SAME WAND block path as q56's exact
    // phrase — only the verify regex differs. The oracle recomputes the
    // proximity test with an independent regex engine (DuckDB RE2) over
    // the same canonical token stream; top-20 cut tie-stable as in q24.
    "q78_phrase_slop" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val pf = QueryEngine.phraseFilter(idx, docs(s, dir), "doc_id",
        Seq("text"), "merge group", slop = 2)
      graft.query.BlockMaxTopK.query(idx, IndexCache.blocks(s, dir),
        "merge group", BM25(), k = 200, blockSize = IndexCache.BlockSize,
        docFilter = Some(pf))
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // Four-clause BOOL query: must="merge" (required AND scored),
    // should="spark table" (scored only), mustNot="window" (excluded),
    // filter = even doc ids (unscored attribute clause). The oracle
    // recomputes each clause independently: conj over the first slot only
    // (mustCount=1), NOT IN over the exclusion's prefix match set, the
    // attribute predicate as docWhere — all over the same full scoring
    // pipeline for the must+should term slots.
    "q79_bool" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      val even = docs(s, dir).filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"))
      QueryEngine.boolQuery(idx, BM25(), must = "merge",
        should = "spark table", mustNot = "window", docFilter = Some(even))
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("doc_id"))
    }),

    // NUMERIC HISTOGRAM over a match set (the aggregation sibling of q60's
    // facets): docs matching "merge spar" bucketed by text length into
    // width-64 bins. Independent oracle: DuckDB recomputes the prefix
    // match set and the floor-division binning from the raw table.
    "q80_histogram" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.histogram(idx, docs(s, dir), "doc_id",
        length(col("text")), 64.0, "merge spar")
    }),

    // TERM VECTORS for three docs: per (doc, term) the doc-local
    // occurrence count and the term's corpus df — the moreLikeThis seed
    // relation as a first-class result. Oracle: the post/tdf CTEs joined
    // and filtered to the same ids.
    "q81_term_vectors" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.termVectors(idx, Seq(3L, 7L, 11L))
    }),

    // DIS-MAX multi-field BM25 (tieBreaker 0.3): per term, best field +
    // 0.3 × the rest, instead of the reference field sum — over the same
    // two-field index and boosts as q30, so the two rules' outputs differ
    // exactly by the combine. The oracle recomputes the dis-max combine at
    // the same composition point (inside the per-(doc, qti) max).
    "q82_bm25_dismax" -> ((s, dir) =>
      QueryEngine.query(IndexCache.documentsMulti(s, dir), "merge src1",
        BM25(tieBreaker = Some(0.3)), boosts = Seq(1.0, 2.0))
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy("doc_id")),

    // SIGNIFICANT TERMS over the "spar merge" match set: per term, its
    // over-representation (lift over doc counts) vs the background corpus,
    // top-15 with a doc-count floor of 3. The cut is decided on the exact
    // f64 division of long products on BOTH sides (no intermediate
    // rounding), so the oracle's ORDER BY reproduces it bit-identically;
    // the emitted score is micro-rounded as usual.
    "q83_sigterms" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.significantTerms(idx, "spar merge", topN = 15,
        minDocCount = 3L)
        .select(col("term"), col("fg_df"), col("bg_df"),
          micro(col("score")).as("score_micro"))
        .orderBy(col("term"))
    }),

    // DFS SCATTER-GATHER top-k: three disjoint shards built independently,
    // each scored locally against the globally folded dictionary + field
    // stats, per-shard top-k unioned and cut — must be indistinguishable
    // from the single-index query, so the oracle is q24's full-corpus
    // top-20 (k=200 retrieval then the tie-stable micro cut, as q24).
    "q84_dfs_topk" -> ((s, dir) => {
      val prepared = IndexCache.dfsShardsPrepared(s, dir)
      ShardedSearch.gatherTopK(prepared, "spar merge", BM25(), k = 200)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    }),

    // COMPLETION SUGGESTER: top-12 dictionary terms under prefix 's' by
    // occurrence-summed df — the cut is on exact BIGINT (df, term) order,
    // so the oracle reproduces it with no float anywhere.
    "q85_complete" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.complete(idx, "s", 12).orderBy(col("term"))
    }),

    // STATS AGGREGATION over the "merge spar" match set: count/min/max/
    // sum/avg of text length in one row. Lengths are integers < 2^53, so
    // the f64 sum is exact and partition-order-independent; min/max/sum/
    // avg emitted micro-rounded as usual.
    "q86_matchstats" -> ((s, dir) => {
      val idx = IndexCache.documents(s, dir)
      QueryEngine.matchStats(idx, docs(s, dir), "doc_id",
        length(col("text")), "merge spar")
        .select(col("n_docs"), micro(col("min_v")).as("min_micro"),
          micro(col("max_v")).as("max_micro"),
          micro(col("sum_v")).as("sum_micro"),
          micro(col("avg_v")).as("avg_micro"))
    }),

    // INDEX STATS: live doc count / vocabulary size / posting rows /
    // total occurrences, recomputed from live tables (all-integer row —
    // the oracle rebuilds every number from the raw text).
    "q87_indexstats" -> ((s, dir) =>
      QueryEngine.indexStats(IndexCache.documents(s, dir)))
    ,

    // WAND-SERVED SCATTER-GATHER over persisted shards: two catalog roots
    // built independently, per-root block tables, per-shard block-max
    // top-k under the globally folded stats, gathered and cut — the full
    // sharded deployment stack (persisted build + blocks + DFS + WAND)
    // against q24's single-index full-corpus oracle.
    "q88_dfs_wand" -> ((s, dir) => {
      val (prepared, blocks, bs, rpg) = IndexCache.dfsWandPrepared(s, dir)
      ShardedSearch.gatherTopKWandPrepared(prepared, blocks, "spar merge",
        BM25(), k = 200, blockSize = bs, rangesPerGroup = rpg)
        .select(col("doc_id"), micro(col("score")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(20)
    })
  )

  // ---------- oracles (DuckDB SQL over the same parquet tables) ----------

  def oracleSql: Map[String, String] = Map(
    "q01_doclen" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |t AS (SELECT doc_id, count(*) AS fl FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(t.fl, 0) AS field_len FROM docs d LEFT JOIN t ON d.doc_id = t.doc_id ORDER BY d.doc_id""".stripMargin,

    "q02_termdf" ->
      """WITH docs AS (SELECT doc_id, text FROM documents)
        |SELECT term, count(*) AS df FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs) GROUP BY term ORDER BY term""".stripMargin,

    "q03_postings" ->
      """WITH docs AS (SELECT doc_id, text FROM documents)
        |SELECT term, doc_id, count(*) AS tf FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs) GROUP BY term, doc_id ORDER BY term, doc_id""".stripMargin,

    "q04_fieldstats" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |t AS (SELECT doc_id, count(*) AS fl FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs) GROUP BY doc_id),
        |dl AS (SELECT d.doc_id, coalesce(t.fl, 0) AS fl FROM docs d LEFT JOIN t ON d.doc_id = t.doc_id)
        |SELECT count(*) AS n_docs, CAST(sum(fl) AS BIGINT) AS sum_len, CAST(round((sum(fl) * 1.0 / count(*)) * 1000000.0) AS BIGINT) AS avg_len_micro FROM dl""".stripMargin,

    "q05_bm25_exact" -> bm25Sql(Seq("merge", "the", "data"), ""),
    "q06_bm25_prefix" -> bm25Sql(Seq("spar", "s"), ""),

    "q07_expand" ->
      """WITH docs AS (SELECT doc_id, text FROM documents)
        |SELECT DISTINCT term FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs) WHERE term LIKE 's%' ORDER BY term""".stripMargin,

    "q08_bm25_delete" -> bm25Sql(Seq("data", "table"), "WHERE doc_id % 7 <> 0"),

    "q28_bm25_codetok" -> bm25Sql(Seq("merge", "dat", "."), "",
      toksCte = CodeToksCte),

    // two-field BM25 (text boost 1.0, source boost 2.0): per-field tf and
    // length norm, occurrence df summed ACROSS fields, merge rule as in
    // bm25Sql. k1=1.2, b=0.75 inlined: 2.2=k1+1, 0.25=1-b.
    "q30_bm25_multifield" ->
      """WITH docs AS (SELECT doc_id, text, source FROM documents),
        |tk0 AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs),
        |tk1 AS (SELECT doc_id, unnest(list_filter(string_split(source, ' '), x -> x <> '')) AS term FROM docs),
        |dl AS (SELECT d.doc_id, coalesce(a.c, 0) AS fl0, coalesce(b.c, 0) AS fl1
        |       FROM docs d
        |       LEFT JOIN (SELECT doc_id, count(*) AS c FROM tk0 GROUP BY doc_id) a ON d.doc_id = a.doc_id
        |       LEFT JOIN (SELECT doc_id, count(*) AS c FROM tk1 GROUP BY doc_id) b ON d.doc_id = b.doc_id),
        |st AS (SELECT count(*) AS n, sum(fl0) AS s0, sum(fl1) AS s1 FROM dl),
        |p0 AS (SELECT term, doc_id, count(*) AS tf FROM tk0 GROUP BY term, doc_id),
        |p1 AS (SELECT term, doc_id, count(*) AS tf FROM tk1 GROUP BY term, doc_id),
        |post AS (SELECT coalesce(p0.term, p1.term) AS term,
        |                coalesce(p0.doc_id, p1.doc_id) AS doc_id,
        |                coalesce(p0.tf, 0) AS tf0, coalesce(p1.tf, 0) AS tf1
        |         FROM p0 FULL JOIN p1 ON p0.term = p1.term AND p0.doc_id = p1.doc_id),
        |tdf AS (SELECT term, sum(tf0 + tf1) AS df FROM post GROUP BY term),
        |qt AS (SELECT * FROM (VALUES (0, 'merge'), (1, 'src1')) AS t(qti, qterm)),
        |exp AS (SELECT qt.qti, qt.qterm, tdf.term AS eterm, tdf.df
        |        FROM qt JOIN tdf ON tdf.term LIKE qt.qterm || '%'),
        |esc AS (SELECT e.qti, e.eterm,
        |  ln(1 + ((st.n - least(st.n, e.df)) + 0.5) / (least(st.n, e.df) + 0.5)) AS idf,
        |  CASE WHEN e.eterm = e.qterm THEN 1.0
        |       ELSE ln(1 + 1.0 / (1.0 + strlen(e.eterm) - strlen(e.qterm))) END AS boost
        |  FROM exp e, st),
        |sc AS (SELECT p.doc_id, s.qti,
        |  max((CASE WHEN p.tf0 > 0 THEN ((2.2 * p.tf0) / (1.2 * (0.25 + 0.75 * (d.fl0 / (st.s0 * 1.0 / st.n))) + p.tf0)) * 1.0 ELSE 0.0 END
        |     + CASE WHEN p.tf1 > 0 THEN ((2.2 * p.tf1) / (1.2 * (0.25 + 0.75 * (d.fl1 / (st.s1 * 1.0 / st.n))) + p.tf1)) * 2.0 ELSE 0.0 END)
        |      * s.idf * s.boost) AS mts
        |  FROM post p JOIN esc s ON p.term = s.eterm
        |  JOIN dl d ON d.doc_id = p.doc_id, st
        |  GROUP BY p.doc_id, s.qti)
        |SELECT doc_id, CAST(round(sum(mts) * 1000000.0) AS BIGINT) AS score_micro
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // WAND pruning is lossless, so the exhaustive BM25 top-k is the oracle;
    // tie-stable cut: order by (micro score desc, doc_id asc) on both sides
    "q24_wand" -> bm25Sql(Seq("spar", "merge"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20"),

    // same oracle for the persisted-block variant (same query, same
    // lossless pruning — only the storage path differs)
    "q37_wand_persisted" -> bm25Sql(Seq("spar", "merge"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20"),

    // incremental block fold must be invisible: the folded table serves
    // the same full-corpus result as a from-scratch build (same query and
    // cut as q24/q37 — only the maintenance path differs)
    "q43_wand_append_fold" -> bm25Sql(Seq("spar", "merge"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20"),

    // persisted delete+vacuum+rebuilt-blocks lifecycle: the vacuumed index
    // must be indistinguishable from an index built on the filtered corpus
    // (q08 proved that equivalence for the in-memory path; this gates the
    // stage-atomic persisted rewrite), WAND cut tie-stable as in q24
    "q38_bm25_vacuum" -> bm25Sql(Seq("spar", "table"), "WHERE doc_id % 5 <> 0",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20"),

    // streamed appends must be invisible: oracle = BM25 over the FULL
    // corpus in one pass (the q34 pattern, arriving via three micro-batches)
    "q39_bm25_streamed" -> bm25Sql(Seq("merge", "s"), ""),

    // the startsWith-scan fallback computes the same scores as the
    // collected plan — same SQL pipeline
    "q40_bm25_scanexp" -> bm25Sql(Seq("s", "merge"), ""),

    // zero-to-one under the prefix-disjoint reduction (see the q09 query
    // comment): per (doc, qti) the max-score entry consumes, tiebreak
    // expanded-term asc; contribution min(score/tf,1)·tf/max(fl, qlen=2)
    "q09_zto" -> ztoSql(),

    // zero-to-one WAND: pruning is lossless, so the same reduction with a
    // tie-stable micro-unit top-20 cut is the oracle
    "q32_zto_wand" -> ztoSql("ORDER BY score_micro DESC, doc_id ASC LIMIT 20"),

    // persisted-catalog BM25 (prefix expansion through the persisted
    // dictionary): identical semantics to the in-memory path, so the same
    // end-to-end SQL pipeline is the oracle
    "q33_bm25_persisted" -> bm25Sql(Seq("spark", "filt"), ""),

    // incremental append must be invisible: oracle = BM25 over the FULL
    // corpus in one pass
    "q34_bm25_append" -> bm25Sql(Seq("data", "table"), ""),

    // zero-to-one greedy pool, EXACT closed form for a 2-term query: sort
    // entries per doc by (score desc, qti asc, node asc); e1 = the first
    // entry — it always consumes (first touch of its node seeds the pool
    // at tf−1, reference zero_to_one.rs:110-113); every later entry of
    // e1.qti is skipped by the consumed check BEFORE any pool touch
    // (zero_to_one.rs:101-103), so pools see at most one entry per qti; the
    // second consumed entry is therefore the first other-qti entry whose
    // node differs from e1's (fresh pool — first touch always consumes) OR
    // shares it with tf ≥ 2 (pool tf−1 ≥ 1 decrements and consumes;
    // zero_to_one.rs:104-113). Contribution per consumed entry:
    // min(score/tf,1)·tf/max(fl, qlen=2). The reduction is fuzz-pinned
    // against the real greedy loop (ZtoPoolProps); the general n-term loop
    // would need a recursive CTE carrying (consumed-set, per-node pool)
    // state — the 2-term closed form is exact and engine-portable.
    "q35_zto_pool" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs),
        |t AS (SELECT doc_id, count(*) AS fl FROM toks GROUP BY doc_id),
        |doclen AS (SELECT d.doc_id, coalesce(t.fl, 0) AS fl FROM docs d LEFT JOIN t ON d.doc_id = t.doc_id),
        |post AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id),
        |tdf AS (SELECT DISTINCT term FROM post),
        |qt AS (SELECT * FROM (VALUES (0, 's'), (1, 'spark')) AS t(qti, qterm)),
        |exp AS (SELECT qt.qti, tdf.term AS node,
        |         1.0 - (strlen(tdf.term) - strlen(qt.qterm)) * 1.0 / strlen(tdf.term) AS score
        |        FROM qt JOIN tdf ON tdf.term LIKE qt.qterm || '%'),
        |ent AS (SELECT p.doc_id, e.qti, e.node, e.score, p.tf, d.fl
        |        FROM post p JOIN exp e ON p.term = e.node JOIN doclen d ON d.doc_id = p.doc_id),
        |ord AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, qti ASC, node ASC) AS rn FROM ent),
        |e1 AS (SELECT * FROM ord WHERE rn = 1),
        |e2c AS (SELECT o.doc_id AS doc_id, o.score AS score, o.tf AS tf, o.fl AS fl,
        |         row_number() OVER (PARTITION BY o.doc_id ORDER BY o.rn ASC) AS rn2
        |        FROM ord o JOIN e1 ON o.doc_id = e1.doc_id
        |        WHERE o.qti <> e1.qti AND (o.node <> e1.node OR o.tf >= 2)),
        |cons AS (SELECT doc_id, score, tf, fl FROM e1
        |         UNION ALL SELECT doc_id, score, tf, fl FROM e2c WHERE rn2 = 1)
        |SELECT doc_id, CAST(round(sum(least(score / tf, 1.0) * tf / greatest(fl, 2)) * 1000000.0) AS BIGINT) AS score_micro
        |FROM cons GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // persisted ANN index: the STORED assignment is the same hash family
    // and multiprobe set as q22's index-free path, so the identical SQL is
    // the oracle (vec_id column name shared by both query shapes)
    "q36_ann_persisted" -> annLshTopKSql(),

    // same sign-LSH bucket math as q16 (proven hash-identical), the same
    // 1-bit multiprobe set as Similarity.lshProbeCandidates, exact cosine
    // (same shape as q15), tie-stable micro-unit top-20
    "q22_ann_lsh" -> annLshTopKSql(),
    "q44_ann_ivf" -> AnnIvfTopKSql,
    "q45_ann_ivf_persisted" -> AnnIvfTopKSql,
    "q46_ann_ivf_streamed" -> AnnIvfStreamedSql,

    "q10_exact_dup" ->
      """WITH aug AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0),
        |fp AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint FROM aug)
        |SELECT fingerprint, count(*) AS n_dups, min(doc_id) AS keep_id FROM fp GROUP BY fingerprint HAVING count(*) >= 2 ORDER BY fingerprint""".stripMargin,

    "q11_minhash" ->
      s"""WITH $SigCte
         |SELECT doc_id, h, minhash FROM sig ORDER BY doc_id, h""".stripMargin,

    "q12_lsh_pairs" ->
      s"""WITH $SigCte,
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |      FROM sig a JOIN sig b ON a.h = b.h AND a.minhash = b.minhash AND a.doc_id < b.doc_id
         |      GROUP BY a.doc_id, b.doc_id, a.h // 2 HAVING count(*) = 2)
         |SELECT DISTINCT id_a, id_b FROM p ORDER BY id_a, id_b""".stripMargin,

    "q13_simhash" ->
      """WITH tv AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM documents) GROUP BY doc_id, term),
        |th AS (SELECT doc_id, tf, CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h FROM tv),
        |bits AS (SELECT doc_id, gb.b AS b, sum(CASE WHEN ((h >> gb.b) & 1) = 1 THEN tf ELSE -tf END) AS v
        |         FROM th, generate_series(0, 31) gb(b) GROUP BY doc_id, gb.b)
        |SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS BIGINT) AS simhash FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q14_jaccard" ->
      s"""WITH $ShinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |cold AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) BETWEEN 2 AND 200),
         |pr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN cold USING (shingle)),
         |pairs AS (SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS inter
         |          FROM pr l JOIN pr r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
         |          GROUP BY l.doc_id, r.doc_id)
         |SELECT p.id_a, p.id_b, p.inter, sa.sz AS size_a, sb.sz AS size_b,
         |       CAST(round((p.inter * 1.0 / (sa.sz + sb.sz - p.inter)) * 1000000.0) AS BIGINT) AS jaccard_micro
         |FROM pairs p JOIN sizes sa ON sa.doc_id = p.id_a JOIN sizes sb ON sb.doc_id = p.id_b
         |WHERE (p.inter * 1.0 / (sa.sz + sb.sz - p.inter)) >= 0.02
         |ORDER BY p.id_a, p.id_b""".stripMargin,

    "q29_jaccard_lsh" ->
      s"""WITH $SigCte,
         |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM sig a JOIN sig b ON a.h = b.h AND a.minhash = b.minhash AND a.doc_id < b.doc_id
         |         GROUP BY a.doc_id, b.doc_id, a.h // 2 HAVING count(*) = 2),
         |cp AS (SELECT DISTINCT id_a, id_b FROM cand),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |ix AS (SELECT c.id_a, c.id_b, count(*) AS inter
         |       FROM cp c JOIN sh a ON a.doc_id = c.id_a
         |       JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
         |       GROUP BY c.id_a, c.id_b)
         |SELECT i.id_a, i.id_b, i.inter, sa.sz AS size_a, sb.sz AS size_b,
         |       CAST(round((i.inter * 1.0 / (sa.sz + sb.sz - i.inter)) * 1000000.0) AS BIGINT) AS jaccard_micro
         |FROM ix i JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
         |WHERE (i.inter * 1.0 / (sa.sz + sb.sz - i.inter)) >= 0.02
         |ORDER BY i.id_a, i.id_b""".stripMargin,

    // q29's pair pipeline over the dup-injected corpus at jaccard ≥ 0.5,
    // then components via RECURSIVE reachability (id, min reachable id) —
    // an independent formulation of the engine's label propagation
    "q42_neardup_components" ->
      s"""WITH RECURSIVE aug AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0),
         |tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM aug),
         |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM tk WHERE len(t) >= 3),
         |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx),
         |hx AS (SELECT doc_id, md5(shingle) AS hex FROM sh),
         |hv AS (SELECT doc_id, j,
         |         CAST(('0x' || substr(hex, 1, 14)) AS BIGINT)
         |         + j * CAST(('0x' || substr(hex, 15, 14)) AS BIGINT) AS v
         |       FROM hx, generate_series(0, 7) hj(j)),
         |sig AS (SELECT doc_id, j AS h, min(v) AS minhash FROM hv GROUP BY doc_id, j),
         |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM sig a JOIN sig b ON a.h = b.h AND a.minhash = b.minhash AND a.doc_id < b.doc_id
         |         GROUP BY a.doc_id, b.doc_id, a.h // 2 HAVING count(*) = 2),
         |cp AS (SELECT DISTINCT id_a, id_b FROM cand),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |ix AS (SELECT c.id_a, c.id_b, count(*) AS inter
         |       FROM cp c JOIN sh a ON a.doc_id = c.id_a
         |       JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
         |       GROUP BY c.id_a, c.id_b),
         |pair AS (SELECT i.id_a, i.id_b FROM ix i
         |         JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
         |         WHERE (i.inter * 1.0 / (sa.sz + sb.sz - i.inter)) >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pair UNION SELECT id_b, id_a FROM pair),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (SELECT id, id FROM nodes
         |                 UNION
         |                 SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id)
         |SELECT id, min(r) AS component FROM reach GROUP BY id ORDER BY id""".stripMargin,

    // same bucket math as q16, all same-bucket pairs, exact cosine,
    // micro-unit threshold (cos ≥ 0.2 ⇔ cos_micro ≥ 200000)
    "q31_cos_neardup" ->
      """WITH hp AS (SELECT gb.b AS b, gi.i AS i,
        |    CASE WHEN (CAST(('0x' || substr(md5('hp:' || CAST(gb.b AS VARCHAR) || ':' || CAST(gi.i AS VARCHAR)), 1, 15)) AS BIGINT) & 1) = 1 THEN 1.0 ELSE -1.0 END AS s
        |  FROM generate_series(0, 7) gb(b), generate_series(0, 63) gi(i)),
        |proj AS (SELECT e.vec_id, hp.b, sum(CAST(e.embedding[hp.i + 1] AS DOUBLE) * hp.s) AS p
        |         FROM embeddings e, hp GROUP BY e.vec_id, hp.b),
        |bkt AS (SELECT vec_id, CAST(sum(CASE WHEN p > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS BIGINT) AS bucket FROM proj GROUP BY vec_id),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |parts AS (SELECT p.id_a, p.id_b,
        |    sum(CAST(ea.embedding[g.i] AS DOUBLE) * CAST(eb.embedding[g.i] AS DOUBLE)) AS dot,
        |    sum(CAST(ea.embedding[g.i] AS DOUBLE) * CAST(ea.embedding[g.i] AS DOUBLE)) AS na,
        |    sum(CAST(eb.embedding[g.i] AS DOUBLE) * CAST(eb.embedding[g.i] AS DOUBLE)) AS nb
        |  FROM pairs p JOIN embeddings ea ON ea.vec_id = p.id_a
        |  JOIN embeddings eb ON eb.vec_id = p.id_b, generate_series(1, 64) g(i)
        |  GROUP BY p.id_a, p.id_b)
        |SELECT * FROM (
        |  SELECT id_a, id_b, CAST(round((dot / (sqrt(na) * sqrt(nb))) * 1000000.0) AS BIGINT) AS cos_micro
        |  FROM parts)
        |WHERE cos_micro >= 200000 ORDER BY id_a, id_b""".stripMargin,

    // q31 with the hot-bucket cap ENGAGED: only buckets holding 2..6
    // vectors generate candidate pairs — the same per-bucket rule
    // cosineNearDups applies (bsz >= 2 AND bsz <= maxBucket)
    "q41_cos_neardup_capped" ->
      """WITH hp AS (SELECT gb.b AS b, gi.i AS i,
        |    CASE WHEN (CAST(('0x' || substr(md5('hp:' || CAST(gb.b AS VARCHAR) || ':' || CAST(gi.i AS VARCHAR)), 1, 15)) AS BIGINT) & 1) = 1 THEN 1.0 ELSE -1.0 END AS s
        |  FROM generate_series(0, 7) gb(b), generate_series(0, 63) gi(i)),
        |proj AS (SELECT e.vec_id, hp.b, sum(CAST(e.embedding[hp.i + 1] AS DOUBLE) * hp.s) AS p
        |         FROM embeddings e, hp GROUP BY e.vec_id, hp.b),
        |bkt AS (SELECT vec_id, CAST(sum(CASE WHEN p > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS BIGINT) AS bucket FROM proj GROUP BY vec_id),
        |keep AS (SELECT bucket FROM bkt GROUP BY bucket HAVING count(*) BETWEEN 2 AND 6),
        |bk AS (SELECT b.vec_id, b.bucket FROM bkt b JOIN keep USING (bucket)),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |parts AS (SELECT p.id_a, p.id_b,
        |    sum(CAST(ea.embedding[g.i] AS DOUBLE) * CAST(eb.embedding[g.i] AS DOUBLE)) AS dot,
        |    sum(CAST(ea.embedding[g.i] AS DOUBLE) * CAST(ea.embedding[g.i] AS DOUBLE)) AS na,
        |    sum(CAST(eb.embedding[g.i] AS DOUBLE) * CAST(eb.embedding[g.i] AS DOUBLE)) AS nb
        |  FROM pairs p JOIN embeddings ea ON ea.vec_id = p.id_a
        |  JOIN embeddings eb ON eb.vec_id = p.id_b, generate_series(1, 64) g(i)
        |  GROUP BY p.id_a, p.id_b)
        |SELECT * FROM (
        |  SELECT id_a, id_b, CAST(round((dot / (sqrt(na) * sqrt(nb))) * 1000000.0) AS BIGINT) AS cos_micro
        |  FROM parts)
        |WHERE cos_micro >= 200000 ORDER BY id_a, id_b""".stripMargin,

    "q15_cosine" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |parts AS (SELECT e.vec_id,
        |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(q.qv[g.i] AS DOUBLE)) AS dot,
        |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(e.embedding[g.i] AS DOUBLE)) AS nd,
        |    sum(CAST(q.qv[g.i] AS DOUBLE) * CAST(q.qv[g.i] AS DOUBLE)) AS nq
        |  FROM embeddings e, q, generate_series(1, 64) g(i) GROUP BY e.vec_id)
        |SELECT vec_id, CAST(round((dot / (sqrt(nd) * sqrt(nq))) * 1000000.0) AS BIGINT) AS cos_micro FROM parts ORDER BY vec_id""".stripMargin,

    "q16_lsh_buckets" ->
      """WITH hp AS (SELECT gb.b AS b, gi.i AS i,
        |    CASE WHEN (CAST(('0x' || substr(md5('hp:' || CAST(gb.b AS VARCHAR) || ':' || CAST(gi.i AS VARCHAR)), 1, 15)) AS BIGINT) & 1) = 1 THEN 1.0 ELSE -1.0 END AS s
        |  FROM generate_series(0, 7) gb(b), generate_series(0, 63) gi(i)),
        |proj AS (SELECT e.vec_id, hp.b, sum(CAST(e.embedding[hp.i + 1] AS DOUBLE) * hp.s) AS p
        |         FROM embeddings e, hp GROUP BY e.vec_id, hp.b)
        |SELECT vec_id, CAST(sum(CASE WHEN p > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS BIGINT) AS bucket FROM proj GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q17_quality" ->
      """WITH t AS (SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
        |m AS (SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  CASE WHEN len(toks) > 0 THEN list_aggregate(list_transform(toks, x -> strlen(x)), 'sum') * 1.0 / len(toks) ELSE 0.0 END AS mtl,
        |  CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for','with','as','by','at','this','that'], x))) * 1.0 / len(toks) ELSE 0.0 END AS stop,
        |  CASE WHEN strlen(text) > 0 THEN len(regexp_extract_all(text, '[A-Za-z]')) * 1.0 / strlen(text) ELSE 0.0 END AS alpha
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(round(mtl * 1000000.0) AS BIGINT) AS mtl_micro,
        |  CAST(round(stop * 1000000.0) AS BIGINT) AS stop_micro,
        |  CAST(round(alpha * 1000000.0) AS BIGINT) AS alpha_micro,
        |  CAST(round((least(n_tokens * 1.0 / 20.0, 1.0) * (1.0 - abs(stop - 0.1)) * alpha) * 1000000.0) AS BIGINT) AS quality_micro
        |FROM m ORDER BY doc_id""".stripMargin,

    "q18_tokcounts" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q19_langid" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, 'de' AS lang, len(list_filter(toks, x -> list_contains(['der','die','und','das','nicht','ist'], x))) * 1.0 / greatest(len(toks), 1) AS ratio FROM t
        |  UNION ALL SELECT doc_id, 'en', len(list_filter(toks, x -> list_contains(['the','a','and','of','to','is'], x))) * 1.0 / greatest(len(toks), 1) FROM t
        |  UNION ALL SELECT doc_id, 'es', len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en'], x))) * 1.0 / greatest(len(toks), 1) FROM t
        |  UNION ALL SELECT doc_id, 'fr', len(list_filter(toks, x -> list_contains(['le','la','et','les','des','est'], x))) * 1.0 / greatest(len(toks), 1) FROM t),
        |r AS (SELECT doc_id, lang, ratio, row_number() OVER (PARTITION BY doc_id ORDER BY ratio DESC, lang ASC) AS rn FROM s)
        |SELECT doc_id, lang AS lang_pred, CAST(round(ratio * 1000000.0) AS BIGINT) AS ratio_micro FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q20_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint FROM documents ORDER BY doc_id""".stripMargin,

    "q23_sha" ->
      "SELECT doc_id, sha256(text) AS sha FROM documents ORDER BY doc_id",

    // recomputes Multimodal.syntheticMedia's construction: dims from the
    // first two text bytes (all-ASCII corpus, so ascii(char k) == byte k;
    // docs are never shorter than 2 chars), format alternating on byte
    // length, and the CLOSED-FORM blob sizes (PNG: 8 sig + 25 IHDR +
    // 23 IDAT framing + h·(w+1) stored pixels/filters + 12 IEND;
    // JPEG header stub: 35). The engine side must parse these numbers
    // back out of real IHDR/SOF0 header bytes.
    "q21_multimodal" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN strlen(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |    64 + (ascii(substr(text, 1, 1)) % 64) AS width,
        |    64 + (ascii(substr(text, 2, 1)) % 64) AS height
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN format = 'png' THEN 68 + height * (width + 1) ELSE 35 END AS BIGINT) AS n_bytes,
        |  format, width, height,
        |  CASE WHEN format = 'png' THEN 'png-pixels' ELSE 'bytes' END AS feature_src
        |FROM m ORDER BY doc_id""".stripMargin,

    "q27_rollhash" ->
      """SELECT doc_id, list_reduce(
        |  list_prepend(0::BIGINT, list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
        |    t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 2147483647)),
        |  (a, b) -> (a * 31 + b) % 2147483647) AS rollhash
        |FROM documents ORDER BY doc_id""".stripMargin,

    // repetition signals: the bigram mode via a completely different plan
    // (unnest positions → group → max) than the engine's row-local sorted
    // run-length fold; ratios computed ratio-first then micro'd, matching
    // the Spark round(x * 1e6) order exactly
    "q47_repetition" ->
      """WITH r AS (SELECT doc_id, replace(text, ' a ', chr(10)) AS r FROM documents),
        |doc2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN r || chr(10) || string_split(r, chr(10))[1] ELSE r END AS text
        |  FROM r),
        |base AS (SELECT doc_id,
        |    list_filter(string_split(text, chr(10)), x -> x <> '') AS ls,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM doc2),
        |lines AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
        |    CASE WHEN len(ls) > 0 THEN CAST(round(((len(ls) - len(list_distinct(ls))) * 1.0 / len(ls)) * 1000000.0) AS BIGINT) ELSE 0 END AS dup_micro
        |  FROM base),
        |pos AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        |  FROM base WHERE len(toks) >= 2),
        |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram FROM pos),
        |cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |mx AS (SELECT doc_id, max(c) AS mc FROM cnt GROUP BY 1),
        |tok AS (SELECT doc_id, len(toks) AS n FROM base)
        |SELECT l.doc_id, l.n_lines, l.dup_micro,
        |  CAST(COALESCE(m.mc, 0) AS BIGINT) AS top_bigram_n,
        |  CASE WHEN t.n >= 2 THEN CAST(round((COALESCE(m.mc, 0) * 1.0 / (t.n - 1)) * 1000000.0) AS BIGINT) ELSE 0 END AS top_bg_micro
        |FROM lines l JOIN tok t USING (doc_id) LEFT JOIN mx m ON l.doc_id = m.doc_id
        |ORDER BY doc_id""".stripMargin,

    // DuckDB's regexp engine is RE2; the patterns are written in the
    // java ∩ RE2 subset so both engines run them verbatim. 'g' flag per
    // the DuckDB default-single-replacement quirk.
    "q48_redact" ->
      """WITH s AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' see https://ex.org/p' || doc_id ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' || (doc_id % 256) || '.1' ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS text_clean
        |FROM s ORDER BY doc_id""".stripMargin,

    "q49_bm25_fuzzy" ->
      bm25Sql(Seq("sart", "scan", "kay"), "", fuzzy = true),

    // decontamination: the same ShinglesCte as the minhash oracles (q11 —
    // proven to mirror Portable.tokens/shinglesOfTokens), benchmark set =
    // the doc_id % 37 = 0 slice, overlap via join + per-doc counts;
    // fraction computed ratio-first then micro'd like the Spark side
    "q50_decontaminate" ->
      s"""WITH $ShinglesCte,
         |bs AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 37 = 0),
         |tot AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
         |con AS (SELECT s.doc_id, count(*) AS n_contaminated
         |        FROM sh s JOIN bs USING (shingle) GROUP BY s.doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(t.n_shingles, 0) AS BIGINT) AS n_shingles,
         |  CAST(COALESCE(c.n_contaminated, 0) AS BIGINT) AS n_contaminated,
         |  CASE WHEN COALESCE(t.n_shingles, 0) > 0
         |       THEN CAST(round(COALESCE(c.n_contaminated, 0) * 1.0 / t.n_shingles * 1000000.0) AS BIGINT)
         |       ELSE 0 END AS contam_micro
         |FROM documents d
         |LEFT JOIN tot t ON d.doc_id = t.doc_id
         |LEFT JOIN con c ON d.doc_id = c.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // stratified sampling: thresholds generated from the SAME SampleRates
    // map + Sampling.threshold the engine filters with (60-bit md5 draw)
    "q51_stratified_sample" -> {
      val cases = SampleRates.toSeq.sortBy(_._1).map { case (k, r) =>
        s"WHEN '$k' THEN ${graft.pipeline.Sampling.threshold(r)}"
      }.mkString(" ")
      s"""SELECT doc_id, source FROM documents
         |WHERE CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |  < CASE source $cases ELSE 0 END
         |ORDER BY doc_id""".stripMargin
    },

    // sequence packing: the same greedy first-fit walk expressed as a
    // recursive CTE stepping row-rank within each shard — an independent
    // sequential formulation of the fold the engine runs per group
    "q52_seq_packing" ->
      """WITH RECURSIVE toks AS (
        |  SELECT source AS shard, doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |packed AS (
        |  SELECT shard, doc_id, n_tokens, rn,
        |    CAST(0 AS BIGINT) AS pack_id, CAST(1 AS BIGINT) AS pack_pos,
        |    CAST(n_tokens AS BIGINT) AS fill
        |  FROM toks WHERE rn = 1
        |  UNION ALL
        |  SELECT t.shard, t.doc_id, t.n_tokens, t.rn,
        |    CASE WHEN p.fill > 0 AND p.fill + t.n_tokens > 64
        |         THEN p.pack_id + 1 ELSE p.pack_id END,
        |    CASE WHEN p.fill > 0 AND p.fill + t.n_tokens > 64
        |         THEN 1 ELSE p.pack_pos + 1 END,
        |    CASE WHEN p.fill > 0 AND p.fill + t.n_tokens > 64
        |         THEN CAST(t.n_tokens AS BIGINT) ELSE p.fill + t.n_tokens END
        |  FROM packed p JOIN toks t ON t.shard = p.shard AND t.rn = p.rn + 1)
        |SELECT shard, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, pack_id,
        |  pack_pos, CAST(CASE WHEN n_tokens > 64 THEN 1 ELSE 0 END AS BIGINT) AS oversize
        |FROM packed ORDER BY shard, doc_id""".stripMargin,

    // filtered search: the same lossless-WAND top-k oracle as q24, with
    // the doc set restricted by the identical source predicate (corpus-
    // level stats — per-doc scores match the unfiltered query's)
    "q53_bm25_filtered" -> bm25Sql(Seq("spar", "merge"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20",
      docWhere = "WHERE source IN ('src1', 'src3', 'src5')"),

    // filtered ANN: the q36 oracle with the label predicate applied to the
    // candidate set (post-probe, pre-top-k — the engine's semi-join point)
    "q54_ann_filtered" -> annLshTopKSql(" AND (em.label % 2) = 1"),

    // percolation: the conjunctive prefix rule recomputed per query as a
    // UNION ALL branch
    "q63_percolate" ->
      """WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents)
        |SELECT doc_id, CAST(1 AS BIGINT) AS qid FROM tk
        | WHERE len(list_filter(t, x -> x LIKE 'spar%')) > 0
        |   AND len(list_filter(t, x -> x LIKE 'merge%')) > 0
        |UNION ALL
        |SELECT doc_id, CAST(2 AS BIGINT) FROM tk
        | WHERE len(list_filter(t, x -> x LIKE 'table%')) > 0
        |UNION ALL
        |SELECT doc_id, CAST(3 AS BIGINT) FROM tk
        | WHERE len(list_filter(t, x -> x LIKE 'slow%')) > 0
        |   AND len(list_filter(t, x -> x LIKE 'key%')) > 0
        |   AND len(list_filter(t, x -> x LIKE 'window%')) > 0
        |ORDER BY doc_id, qid""".stripMargin,

    // span dedup: identical md5 span keys, duplicate = shared by >= 2
    // distinct docs; docs shorter than the window have no spans (and no row)
    "q62_span_dedup" ->
      """WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |w AS (SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS k
        |      FROM tk, unnest(generate_series(1, len(t) - 7)) g(i)),
        |dup AS (SELECT k FROM w GROUP BY k HAVING count(DISTINCT doc_id) >= 2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(CASE WHEN k IN (SELECT k FROM dup) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // facets: match set (any prefix expansion of any term) recomputed from
    // scratch, counted per source
    "q60_facets" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
        |$ToksCte,
        |post AS (SELECT term, doc_id FROM toks GROUP BY term, doc_id),
        |qt(qterm) AS (VALUES ('spar'), ('merge')),
        |m AS (SELECT DISTINCT p.doc_id FROM post p
        |      JOIN qt ON p.term LIKE qt.qterm || '%')
        |SELECT d.source AS facet, CAST(count(*) AS BIGINT) AS n_docs
        |FROM m JOIN documents d ON d.doc_id = m.doc_id
        |GROUP BY d.source ORDER BY n_docs DESC, facet ASC""".stripMargin,

    // more-like-this: the seed doc's salience ranking (occ × idf — post.tf
    // IS the doc's occurrence count on this 1-field corpus), the (weight
    // desc, term asc) rank cut, qti = rank, then the standard pipeline
    // with the seed excluded — all recomputed inside the oracle
    "q61_more_like_this" -> bm25Sql(Nil, "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20",
      docWhere = "WHERE doc_id <> 3",
      qtSelect =
        """SELECT row_number() OVER (ORDER BY w DESC, term ASC) - 1 AS qti,
          |       term AS qterm
          |FROM (SELECT p.term,
          |        p.tf * ln(1 + ((st.n - least(st.n, t.df)) + 0.5) / (least(st.n, t.df) + 0.5)) AS w
          |      FROM post p JOIN tdf t ON p.term = t.term, stats st
          |      WHERE p.doc_id = 3)
          |QUALIFY row_number() OVER (ORDER BY w DESC, term ASC) <= 5""".stripMargin),

    // suggestion: dictionary + ranking recomputed from scratch (DuckDB
    // levenshtein == Spark's on this ASCII corpus; occurrence-counted df
    // like q02)
    "q59_suggest" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
        |$ToksCte,
        |td AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY term),
        |q(qterm) AS (VALUES ('tble'), ('windw'), ('merg'), ('spark')),
        |cand AS (SELECT q.qterm, td.term, td.df, levenshtein(q.qterm, td.term) AS ed
        |         FROM q JOIN td ON levenshtein(q.qterm, td.term) <= 1)
        |SELECT qterm, term AS suggestion, df FROM cand
        |QUALIFY row_number() OVER (PARTITION BY qterm ORDER BY ed ASC, df DESC, term ASC) = 1
        |ORDER BY qterm""".stripMargin,

    // snippets: the engine's deterministic rule replayed with DuckDB list
    // lambdas — same tokenization, same window walk, same earliest-max tie
    "q58_snippets" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
        |), scored AS (
        |  SELECT doc_id, t,
        |    list_transform(generate_series(1, greatest(len(t) - 8 + 1, 1)),
        |      i -> len(list_filter(t[i:i+7], x -> x IN ('spark','merge')))) AS sc
        |  FROM toks
        |)
        |SELECT doc_id,
        |  array_to_string(t[list_position(sc, list_max(sc)):list_position(sc, list_max(sc))+7], ' ') AS snippet,
        |  CAST(list_max(sc) AS INT) AS matches
        |FROM scored WHERE list_max(sc) > 0 ORDER BY doc_id""".stripMargin,

    // batch: one UNION ALL branch per query, each the standard BM25
    // pipeline SQL with its micro-unit top-10 cut — an independent
    // per-query formulation of what the engine computes in one pass
    "q57_bm25_batch" -> Seq(
      (1L, Seq("spar", "merge")),
      (2L, Seq("table")),
      (3L, Seq("slow", "key", "window"))).map { case (qid, terms) =>
        s"SELECT $qid AS qid, * FROM (" + bm25Sql(terms, "",
          finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 10") + ")"
      }.mkString("", "\nUNION ALL\n",
        "\nORDER BY qid ASC, score_micro DESC, doc_id ASC"),

    // phrase: the lossless-WAND top-k oracle restricted to docs whose
    // canonical (empty-filtered, single-space-joined) token stream contains
    // the adjacent sequence — an independent reformulation of the engine's
    // two-phase match+verify
    "q56_bm25_phrase" -> bm25Sql(Seq("merge", "group"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20",
      docWhere = "WHERE ' ' || array_to_string(list_filter(string_split(text, ' '), x -> x <> ''), ' ') || ' ' LIKE '% merge group %'"),

    // conjunctive: q24's lossless-WAND oracle restricted to docs matching
    // every query term (HAVING count(DISTINCT qti) = 2 over the same
    // expansion join the scoring pipeline uses)
    "q55_bm25_conjunctive" -> bm25Sql(Seq("spar", "merge"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20",
      conjunctive = true),

    // boolean NOT: q24's lossless-WAND oracle restricted to docs with NO
    // prefix expansion of the exclusion term (the engine's matchedDocs
    // anti-join recomputed as NOT IN over the same posting relation)
    "q64_bm25_not" -> bm25Sql(Seq("spar", "merge"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20",
      exclTerms = Seq("window")),

    // minimum-should-match: the conj CTE with HAVING >= 2 over the same
    // expansion join the scoring pipeline uses (m-of-n generalization of
    // q55's AND)
    "q68_bm25_minmatch" -> bm25Sql(Seq("spar", "merge", "slow"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20",
      minMatch = 2),

    // regex term search: the variant set recomputed independently
    // (regexp_matches over the term relation), exact expansion join
    // (term =, boost 1.0), all variants under slot 0 → the per-(doc, qti)
    // max in the shared sc CTE IS the regex merge rule
    "q69_bm25_regex" -> bm25Sql(Nil, "",
      qtSelect = "SELECT 0 AS qti, term AS qterm FROM tdf " +
        "WHERE regexp_matches(term, '^s[a-z]+a[a-z]+$')",
      exactExp = true),

    // shard merge: the oracle is the ONE-PASS full-corpus score — the
    // merged two-shard index must be indistinguishable from a single build
    "q70_shard_merge" -> bm25Sql(Seq("window", "key"), ""),

    // persisted shard merge: same one-pass full-corpus oracle, lossless
    // top-k cut (q24 pattern) since the gated path serves WAND
    "q71_persisted_merge" -> bm25Sql(Seq("table", "row"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20"),

    // score explanation: the SAME pipeline kept at per-expansion grain
    // (scx), top-20 doc cut by (micro score, doc_id), then each
    // (doc, qti)'s winning expansion by (micro score desc, term asc)
    "q65_explain" -> bm25Sql(Seq("spar", "merge"), "", explainTopK = 20),

    // search-after page 2 == ranks 21-40 of the same total order
    "q66_search_after" -> bm25Sql(Seq("spar", "merge"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20 OFFSET 20"),

    // synonyms: merge and join share qti 1 — the per-(doc, qti) max in
    // the shared sc CTE IS the synonym merge rule
    "q67_synonyms" -> bm25Sql(Nil, "",
      qpairs = Seq((0, "spar"), (1, "merge"), (1, "join"))),

    "q26_stream_window" ->
      """SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  count(*) AS n, CAST(round(sum(value) * 100.0) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q25_dedup_survivors" ->
      """WITH aug AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0),
        |fp AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint FROM aug),
        |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fingerprint)
        |SELECT doc_id FROM keep ORDER BY doc_id""".stripMargin,

    // hybrid RRF: both lists recomputed from scratch (lexical micro scores
    // via the shared bm25 pipeline, cosine micro via the q15 arithmetic),
    // ranked over (micro desc, id asc), fused as Σ 1.0/(60 + rank) in f64,
    // cut on the RAW fused value (identical f64s cross-engine) before
    // micro-rounding — the engine's exact composition order
    "q72_hybrid_rrf" ->
      s"""WITH bm AS (SELECT * FROM (${bm25Sql(Seq("spar", "merge"), "")})),
        |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |parts AS (SELECT e.vec_id,
        |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(qv.qv[g.i] AS DOUBLE)) AS dot,
        |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(e.embedding[g.i] AS DOUBLE)) AS nd,
        |    sum(CAST(qv.qv[g.i] AS DOUBLE) * CAST(qv.qv[g.i] AS DOUBLE)) AS nq
        |  FROM embeddings e, qv, generate_series(1, 64) g(i) GROUP BY e.vec_id),
        |cosl AS (SELECT vec_id AS doc_id,
        |    CAST(round((dot / (sqrt(nd) * sqrt(nq))) * 1000000.0) AS BIGINT) AS m
        |  FROM parts),
        |ra AS (SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS r FROM bm),
        |rb AS (SELECT doc_id, row_number() OVER (ORDER BY m DESC, doc_id ASC) AS r FROM cosl),
        |u AS (SELECT doc_id, CAST(1 AS DOUBLE) / (60 + r) AS contrib FROM ra WHERE r <= 100
        |  UNION ALL
        |  SELECT doc_id, CAST(1 AS DOUBLE) / (60 + r) FROM rb WHERE r <= 100),
        |f AS (SELECT doc_id, sum(contrib) AS rrf FROM u GROUP BY doc_id),
        |topk AS (SELECT doc_id, rrf FROM f ORDER BY rrf DESC, doc_id ASC LIMIT 20)
        |SELECT doc_id, CAST(round(rrf * 1000000.0) AS BIGINT) AS rrf_micro
        |FROM topk ORDER BY rrf_micro DESC, doc_id ASC""".stripMargin,

    // field collapse: per-source argmax over the same match set with the
    // same (micro desc, doc_id asc) window order
    "q73_collapse" ->
      s"""WITH bm AS (SELECT * FROM (${bm25Sql(Seq("spar", "merge"), "")})),
        |j AS (SELECT bm.doc_id, d.source, bm.score_micro,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY bm.score_micro DESC, bm.doc_id ASC) AS rn
        |  FROM bm JOIN documents d ON d.doc_id = bm.doc_id)
        |SELECT doc_id, source, score_micro FROM j WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // function score: raw per-doc sum × the rational length-decay factor,
    // rounded once — the engine's composition point
    "q74_func_score" -> bm25Sql(Seq("spar", "merge"), "",
      factorExpr = "CAST(1000 AS DOUBLE) / (1000 + d.n_chars)"),

    // two-phase rescore: the top-50 window by (bm25 micro desc, id asc),
    // left-joined with the cosine micro list, blended in exact long
    // arithmetic (1·bm25 + 2·cos), cut to 20 on (blended desc, id asc)
    "q75_rescore" ->
      s"""WITH bm AS (SELECT * FROM (${bm25Sql(Seq("spar", "merge"), "")})),
        |win AS (SELECT doc_id, score_micro FROM bm
        |        ORDER BY score_micro DESC, doc_id ASC LIMIT 50),
        |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |parts AS (SELECT e.vec_id,
        |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(qv.qv[g.i] AS DOUBLE)) AS dot,
        |    sum(CAST(e.embedding[g.i] AS DOUBLE) * CAST(e.embedding[g.i] AS DOUBLE)) AS nd,
        |    sum(CAST(qv.qv[g.i] AS DOUBLE) * CAST(qv.qv[g.i] AS DOUBLE)) AS nq
        |  FROM embeddings e, qv, generate_series(1, 64) g(i) GROUP BY e.vec_id),
        |cosl AS (SELECT vec_id AS doc_id,
        |    CAST(round((dot / (sqrt(nd) * sqrt(nq))) * 1000000.0) AS BIGINT) AS cos_m
        |  FROM parts)
        |SELECT w.doc_id,
        |  CAST(w.score_micro + 2 * coalesce(c.cos_m, 0) AS BIGINT) AS blended_micro
        |FROM win w LEFT JOIN cosl c ON c.doc_id = w.doc_id
        |ORDER BY blended_micro DESC, w.doc_id ASC LIMIT 20""".stripMargin,

    // wildcard term search: the variant set recomputed independently with
    // SQL LIKE ('s?a*' ≡ 's_a%'), exact expansion join, all variants under
    // slot 0 → the shared per-(doc, qti) max IS the wildcard merge rule
    "q76_bm25_wildcard" -> bm25Sql(Nil, "",
      qtSelect = "SELECT 0 AS qti, term AS qterm FROM tdf " +
        "WHERE term LIKE 's_a%'",
      exactExp = true),

    // per-term boosts: the slot weights multiply the expansion boost in the
    // esc CTE — the engine's exact composition point — then the unchanged
    // max/sum pipeline scores independently
    "q77_bm25_boosted" -> bm25Sql(Seq("s", "merge", "key"), "",
      termWeights = Seq(2.5, 0.5, 1.0)),

    // sloppy phrase: q56's oracle with the LIKE adjacency replaced by an
    // ordered-proximity regex (≤ 2 intervening tokens) evaluated by
    // DuckDB's OWN regex engine (RE2) over the same canonical stream
    "q78_phrase_slop" -> bm25Sql(Seq("merge", "group"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20",
      docWhere = "WHERE regexp_matches(' ' || array_to_string(list_filter(string_split(text, ' '), x -> x <> ''), ' ') || ' ', ' merge( [^ ]+){0,2} group ')"),

    // bool: must (conj over slot 0 only) + should (scored slots 1-2) +
    // must_not (prefix exclusion) + attribute filter, each clause
    // recomputed independently over the shared scoring pipeline
    "q79_bool" -> bm25Sql(Seq("merge", "spark", "table"), "",
      mustCount = 1, exclTerms = Seq("window"),
      docWhere = "WHERE doc_id % 2 = 0"),

    // histogram: the prefix match set + floor-division binning recomputed
    // from the raw table (sparse bins; count type BIGINT on both sides)
    "q80_histogram" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs),
        |m AS (SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'merge%' OR term LIKE 'spar%')
        |SELECT CAST(floor(length(text) / 64.0) AS BIGINT) AS bin, count(*) AS n_docs
        |FROM docs WHERE doc_id IN (SELECT doc_id FROM m)
        |GROUP BY bin ORDER BY bin""".stripMargin,

    // term vectors: the post/tdf CTEs (occurrence tf, occurrence-summed
    // df — the reference's pointer-counting semantics) joined and
    // filtered to the gate's doc ids
    "q81_term_vectors" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs),
        |post AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id),
        |tdf AS (SELECT term, sum(tf) AS df FROM post GROUP BY term)
        |SELECT p.doc_id, p.term, CAST(p.tf AS BIGINT) AS occ, CAST(t.df AS BIGINT) AS df
        |FROM post p JOIN tdf t ON p.term = t.term
        |WHERE p.doc_id IN (3, 7, 11)
        |ORDER BY p.doc_id, p.term""".stripMargin,

    // dis-max two-field BM25: q30's oracle with the inner field SUM
    // replaced by greatest + 0.3·(sum − greatest) — the combine applied
    // inside the per-(doc, qti) max at the engine's exact composition
    // point (idf/boost factored outside, equal up to f64 op order under
    // the shared micro rounding)
    "q82_bm25_dismax" ->
      """WITH docs AS (SELECT doc_id, text, source FROM documents),
        |tk0 AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs),
        |tk1 AS (SELECT doc_id, unnest(list_filter(string_split(source, ' '), x -> x <> '')) AS term FROM docs),
        |dl AS (SELECT d.doc_id, coalesce(a.c, 0) AS fl0, coalesce(b.c, 0) AS fl1
        |       FROM docs d
        |       LEFT JOIN (SELECT doc_id, count(*) AS c FROM tk0 GROUP BY doc_id) a ON d.doc_id = a.doc_id
        |       LEFT JOIN (SELECT doc_id, count(*) AS c FROM tk1 GROUP BY doc_id) b ON d.doc_id = b.doc_id),
        |st AS (SELECT count(*) AS n, sum(fl0) AS s0, sum(fl1) AS s1 FROM dl),
        |p0 AS (SELECT term, doc_id, count(*) AS tf FROM tk0 GROUP BY term, doc_id),
        |p1 AS (SELECT term, doc_id, count(*) AS tf FROM tk1 GROUP BY term, doc_id),
        |post AS (SELECT coalesce(p0.term, p1.term) AS term,
        |                coalesce(p0.doc_id, p1.doc_id) AS doc_id,
        |                coalesce(p0.tf, 0) AS tf0, coalesce(p1.tf, 0) AS tf1
        |         FROM p0 FULL JOIN p1 ON p0.term = p1.term AND p0.doc_id = p1.doc_id),
        |tdf AS (SELECT term, sum(tf0 + tf1) AS df FROM post GROUP BY term),
        |qt AS (SELECT * FROM (VALUES (0, 'merge'), (1, 'src1')) AS t(qti, qterm)),
        |exp AS (SELECT qt.qti, qt.qterm, tdf.term AS eterm, tdf.df
        |        FROM qt JOIN tdf ON tdf.term LIKE qt.qterm || '%'),
        |esc AS (SELECT e.qti, e.eterm,
        |  ln(1 + ((st.n - least(st.n, e.df)) + 0.5) / (least(st.n, e.df) + 0.5)) AS idf,
        |  CASE WHEN e.eterm = e.qterm THEN 1.0
        |       ELSE ln(1 + 1.0 / (1.0 + strlen(e.eterm) - strlen(e.qterm))) END AS boost
        |  FROM exp e, st),
        |fld AS (SELECT p.doc_id, p.term,
        |  CASE WHEN p.tf0 > 0 THEN ((2.2 * p.tf0) / (1.2 * (0.25 + 0.75 * (d.fl0 / (st.s0 * 1.0 / st.n))) + p.tf0)) * 1.0 ELSE 0.0 END AS f0,
        |  CASE WHEN p.tf1 > 0 THEN ((2.2 * p.tf1) / (1.2 * (0.25 + 0.75 * (d.fl1 / (st.s1 * 1.0 / st.n))) + p.tf1)) * 2.0 ELSE 0.0 END AS f1
        |  FROM post p JOIN dl d ON d.doc_id = p.doc_id, st),
        |sc AS (SELECT f.doc_id, s.qti,
        |  max((greatest(f.f0, f.f1) + 0.3 * ((f.f0 + f.f1) - greatest(f.f0, f.f1)))
        |      * s.idf * s.boost) AS mts
        |  FROM fld f JOIN esc s ON f.term = s.eterm
        |  GROUP BY f.doc_id, s.qti)
        |SELECT doc_id, CAST(round(sum(mts) * 1000000.0) AS BIGINT) AS score_micro
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // significant terms: doc-counted fg/bg term frequencies + the lift
    // score recomputed from the raw table; the top-15 cut decided on the
    // IDENTICAL exact-long-product f64 division (one rounding at the end)
    "q83_sigterms" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs),
        |m AS (SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'spar%' OR term LIKE 'merge%'),
        |fgn AS (SELECT count(*) AS fg_n FROM m),
        |bgn AS (SELECT count(*) AS bg_n FROM docs),
        |td AS (SELECT term, doc_id FROM toks GROUP BY term, doc_id),
        |fgdf AS (SELECT term, count(*) AS fg_df FROM td WHERE doc_id IN (SELECT doc_id FROM m) GROUP BY term),
        |bgdf AS (SELECT term, count(*) AS bg_df FROM td GROUP BY term)
        |SELECT term, CAST(fg_df AS BIGINT) AS fg_df, CAST(bg_df AS BIGINT) AS bg_df,
        |  CAST(round(1000000.0 * ((CAST(fg_df AS DOUBLE) * CAST(bg_n AS DOUBLE)) / (CAST(fg_n AS DOUBLE) * CAST(bg_df AS DOUBLE)))) AS BIGINT) AS score_micro
        |FROM fgdf JOIN bgdf USING (term), fgn, bgn
        |WHERE fg_df >= 3
        |ORDER BY (CAST(fg_df AS DOUBLE) * CAST(bg_n AS DOUBLE)) / (CAST(fg_n AS DOUBLE) * CAST(bg_df AS DOUBLE)) DESC, term ASC
        |LIMIT 15""".stripMargin,

    // dfs scatter-gather == the single-index query: q24's full-corpus
    // top-20 oracle verbatim (global stats make sharding invisible)
    "q84_dfs_topk" -> bm25Sql(Seq("spar", "merge"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20"),

    // completion: the occurrence-summed dictionary recomputed from the
    // raw table, ranked (df desc, term asc) — all-integer cut
    "q85_complete" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs),
        |post AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id),
        |tdf AS (SELECT term, sum(tf) AS df FROM post GROUP BY term)
        |SELECT term, CAST(df AS BIGINT) AS df FROM tdf
        |WHERE term LIKE 's%'
        |ORDER BY df DESC, term ASC LIMIT 12""".stripMargin,

    // stats over the match set: the same five aggregates over the same
    // integer-valued lengths (f64-exact, order-independent)
    "q86_matchstats" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs),
        |m AS (SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'merge%' OR term LIKE 'spar%'),
        |v AS (SELECT CAST(length(text) AS DOUBLE) AS v FROM docs WHERE doc_id IN (SELECT doc_id FROM m))
        |SELECT count(*) AS n_docs,
        |  CAST(round(min(v) * 1000000.0) AS BIGINT) AS min_micro,
        |  CAST(round(max(v) * 1000000.0) AS BIGINT) AS max_micro,
        |  CAST(round(sum(v) * 1000000.0) AS BIGINT) AS sum_micro,
        |  CAST(round(avg(v) * 1000000.0) AS BIGINT) AS avg_micro
        |FROM v""".stripMargin,

    // index stats: every number rebuilt from the raw token stream
    "q87_indexstats" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM docs),
        |post AS (SELECT term, doc_id FROM toks GROUP BY term, doc_id)
        |SELECT (SELECT count(*) FROM docs) AS n_docs,
        |  (SELECT count(DISTINCT term) FROM toks) AS n_terms,
        |  (SELECT count(*) FROM post) AS posting_rows,
        |  (SELECT count(*) FROM toks) AS total_occ""".stripMargin,

    // WAND-served sharded deployment == the single-index query: q24's
    // full-corpus top-20 oracle verbatim
    "q88_dfs_wand" -> bm25Sql(Seq("spar", "merge"), "",
      finalOrder = "ORDER BY score_micro DESC, doc_id ASC LIMIT 20")
  )
}
