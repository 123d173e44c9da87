package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.InvertedIndex
import graft.score.ScoreModel

/** Scatter-gather top-k over independently built shards — the SERVING
  * topology for a sharded deployment (search-engine "DFS query-then-fetch"):
  * instead of merging shards into one logical index and scanning them
  * together ([[InvertedIndex.merge]] / q70), each shard answers the query
  * LOCALLY and only k-sized result lists cross shard boundaries.
  *
  * Exactness requires one piece of global state: BM25/zero-to-one scores
  * depend on corpus-level statistics (df, avgFieldLength, N — reference
  * bm25.rs:44-58 reads them off the whole index), and shard-local stats
  * would rank the same doc differently per shard. So phase 1 (the "DFS"
  * pre-query) folds the GLOBAL term dictionary and field stats — a
  * vocab-sized `sum(df)` and a 1-row arithmetic fold, the same cross-shard
  * state [[InvertedIndex.merge]] computes — and phase 2 runs the ordinary
  * [[QueryEngine.query]] on each shard AGAINST THE GLOBAL STATS. Every
  * doc's score then equals its single-index score exactly, so the union of
  * per-shard top-k lists contains the true global top-k, and one final
  * k-bounded sort finishes it (TakeOrderedAndProject over shards × k rows —
  * never a corpus-sized set).
  *
  * Tombstones are folded per shard BEFORE the global phase (live postings /
  * docstats, live-df recount when any shard carries tombstones), so deleted
  * docs neither match nor contribute to any statistic.
  *
  * Scale shape: each shard's work is the same term/bucket-pruned scan its
  * standalone query would do; the global dictionary is the ONE shuffle
  * (vocab-sized, computed once per index generation in a real deployment,
  * not per query); the gather stage moves `shards × k` rows. This composes
  * with [[InvertedIndex.merge]]'s build topology: index shards
  * independently, serve them scatter-gather.
  */
object ShardedSearch {

  /** Exact global top-k over `shards` (disjoint doc-id sets, same field
    * layout + tokenizer — [[InvertedIndex.merge]]'s caller contract).
    * Returns `(doc_id, score)`, the same columns and (score desc, doc_id
    * asc) order as [[QueryEngine.query]] with `limit = k`.
    */
  def dfsTopK(shards: Seq[InvertedIndex], queryString: String,
      model: ScoreModel, k: Int, boosts: Seq[Double] = Nil,
      maxCollectedExpansions: Int = 4096,
      tokenizer: String => IndexedSeq[String] = Analyzer.tokenizeRaw): DataFrame =
    gatherTopK(prepareShards(shards), queryString, model, k, boosts,
      maxCollectedExpansions, tokenizer)

  /** Phase 1 alone — fold the global dictionary + field stats and return
    * the per-shard handles phase 2 queries against. A deployment calls
    * this once per index GENERATION, caches the shared global dictionary
    * (`prepared.head.termdict.cache()` — one vocab-sized table, shared by
    * every handle), and serves many [[gatherTopK]] calls; [[dfsTopK]]
    * composes both phases for the one-shot case.
    *
    * Each handle pre-folds its shard's tombstones into its postings and
    * presents the globals as trusted hints (hasTombstones = false), so
    * the ordinary query path neither recounts df shard-locally nor
    * recomputes stats from shard-local docstats.
    */
  def prepareShards(shards: Seq[InvertedIndex]): Seq[InvertedIndex] = {
    require(shards.nonEmpty, "at least one shard")
    val merged = shards.reduce(InvertedIndex.merge)
    // Under tombstones anywhere the dict df must be the LIVE occurrence
    // sum (the same recount the single-index query path does), else the
    // merged sum(df) is already live. The recount keeps the bucket column
    // when postings carry one (persisted shards) — a term hashes to the
    // SAME bucket in every shard, and dropping it would silently disable
    // bucket partition pruning for every query served off the handles.
    val gdict =
      if (merged.hasTombstones) {
        val keys =
          if (merged.postings.columns.contains("bucket"))
            Seq(col("term"), col("bucket")) else Seq(col("term"))
        merged.livePostings.groupBy(keys: _*)
          .agg(sum(col("occ")).cast("long").as("df"))
      } else merged.termdict
    val gstats = merged.fieldStats()
    shards.map { sh =>
      InvertedIndex(postings = sh.livePostings, docstats = sh.liveDocstats,
        termdict = gdict, tombstones = sh.tombstones.limit(0),
        numFields = sh.numFields, hasTombstones = false,
        statsHint = Some(gstats))
    }
  }

  /** Phase 2 alone — scatter the query to [[prepareShards]]' handles,
    * gather per-shard top-k, cut globally. Exact by the superset argument
    * in the object doc.
    */
  def gatherTopK(prepared: Seq[InvertedIndex], queryString: String,
      model: ScoreModel, k: Int, boosts: Seq[Double] = Nil,
      maxCollectedExpansions: Int = 4096,
      tokenizer: String => IndexedSeq[String] = Analyzer.tokenizeRaw): DataFrame = {
    require(prepared.nonEmpty, "at least one shard")
    require(k > 0, "k must be positive")
    prepared.map(h => QueryEngine.query(h, queryString, model, boosts,
        limit = k, maxCollectedExpansions, tokenizer))
      .reduce(_ union _)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** WAND-pruned scatter-gather: per-shard BLOCK-MAX top-k
    * ([[BlockMaxTopK.query]]) under the global statistics, then the same
    * k-bounded gather. Each shard's block table bounds ITS docs' true
    * (global-stats) scores — (max_tf, min_fl) are data properties of the
    * block and the UB expression uses the same global df/stats the scores
    * do — so per-shard WAND is exact and the superset argument carries
    * over unchanged; the cost-based exit and θ-probe run independently
    * per shard against shard-local θ (a valid lower bound on anything in
    * that shard's top-k).
    *
    * Shards must be TOMBSTONE-FREE (vacuum before block-serving — the
    * natural deployment rule, enforced loudly): the handles pre-fold
    * tombstones out of the POSTING store, but block tables decode doc-ids
    * from their own bytes, so a block built before a remove could
    * resurrect the doc without the live anti-join the single-index path
    * keys off `hasTombstones`. [[gatherTopK]] (exhaustive per shard)
    * remains the tombstone-tolerant form.
    *
    * `shardBlocks` aligns positionally with `shards`; `blockSize` /
    * `rangesPerGroup` must match how each shard's table was built (as
    * returned by `IndexCatalog.readBlocks`).
    */
  def gatherTopKWand(shards: Seq[InvertedIndex],
      shardBlocks: Seq[org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block]],
      queryString: String, model: ScoreModel, k: Int, blockSize: Long,
      boosts: Seq[Double] = Nil, rangesPerGroup: Long = 0,
      maxCollectedExpansions: Int = 4096,
      tokenizer: String => IndexedSeq[String] = Analyzer.tokenizeRaw): DataFrame =
    gatherTopKWandPrepared(prepareShardsWand(shards), shardBlocks,
      queryString, model, k, blockSize, boosts, rangesPerGroup,
      maxCollectedExpansions, tokenizer)

  /** Phase 1 of the WAND-served topology: [[prepareShards]] with the
    * tombstone-free contract checked HERE, at prepare time — a WAND-served
    * deployment calls this once per index generation and reuses the folded
    * globals across queries ([[gatherTopKWandPrepared]]); re-folding the
    * vocab-sized dictionary per query was pure fixed overhead.
    */
  def prepareShardsWand(shards: Seq[InvertedIndex]): Seq[InvertedIndex] = {
    require(shards.forall(!_.hasTombstones),
      "gatherTopKWand needs vacuumed (tombstone-free) shards; " +
        "use gatherTopK for tombstoned shards")
    prepareShards(shards)
  }

  /** Phase 2 of the WAND-served topology: per-shard block-max top-k over
    * [[prepareShardsWand]]'s handles, gathered and cut. Same result as
    * [[gatherTopKWand]] by construction (it delegates here).
    */
  def gatherTopKWandPrepared(prepared: Seq[InvertedIndex],
      shardBlocks: Seq[org.apache.spark.sql.Dataset[graft.index.PostingBlocks.Block]],
      queryString: String, model: ScoreModel, k: Int, blockSize: Long,
      boosts: Seq[Double] = Nil, rangesPerGroup: Long = 0,
      maxCollectedExpansions: Int = 4096,
      tokenizer: String => IndexedSeq[String] = Analyzer.tokenizeRaw): DataFrame = {
    require(prepared.size == shardBlocks.size,
      "one block table per shard, positionally aligned")
    require(k > 0, "k must be positive")
    prepared.zip(shardBlocks).map { case (h, b) =>
      BlockMaxTopK.query(h, b, queryString, model, boosts, k,
        blockSize = blockSize, rangesPerGroup = rangesPerGroup,
        maxCollectedExpansions = maxCollectedExpansions,
        tokenizer = tokenizer)
    }.reduce(_ union _)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
