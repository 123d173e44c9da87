package graft.query

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.{InvertedIndex, PostingBlocks}
import graft.score.ScoreModel

/** Block-max WAND-style top-k over compressed posting blocks
  * (north_star: "posting-list intersection with block-max WAND top-k
  * pruning over broadcast term statistics").
  *
  * Blocks share GLOBAL doc-id ranges across terms, so a sound per-range
  * score upper bound exists without decoding anything:
  *
  *   UB(range) = Σ_queryTerm max_expansion modelBound(block metadata)
  *
  * where `modelBound` is the scorer's [[ScoreModel.blockUpperBound]] (BM25:
  * tfn⁺(maxTf)·idf·eboost; zero-to-one: entscore/qlen; a model with no
  * sound metadata bound falls back to exhaustive) — the metadata-only
  * mirror of the merge rule (max within a query term's expansions, sum
  * across query terms, which also dominates zero-to-one's max-over-fields).
  *
  * Three-phase, all distributed, one tiny driver action for the threshold:
  *  1. θ-probe: exact-score the `probeBlocks` ranges with the highest UB;
  *     the k-th best score found is a valid pruning threshold θ (those k
  *     docs are real, so nothing scoring < θ can reach the top k).
  *     Soundness for ANY model (including non-additive ones) rests on
  *     global ranges: a doc lives in exactly one range, and the probe
  *     takes ALL expanded terms' blocks for its ranges, so every probed
  *     doc is scored over its COMPLETE posting set — probe scores are
  *     true scores, never partial ones.
  *  2. prune: keep ranges with UB ≥ θ — at 10^12 docs this is the
  *     difference between decoding every posting of a hot term and
  *     decoding the few ranges that can still matter.
  *  3. exact: decode surviving blocks, score with the SAME expressions as
  *     the exhaustive path, global top-k.
  *
  * Falls back to the exhaustive path when the index has tombstones (stale
  * df would break the upper bound) or the expansion set exceeds the
  * collect cap. Parity with the exhaustive path is asserted in
  * BlockMaxSpec.
  */
object BlockMaxTopK {

  /** @param blocks   block table from [[PostingBlocks.fromPostings]]
    * @param k        top-k size (> 0)
    * @param probeBlocks  number of highest-UB ranges exact-scored to seed θ
    */
  def query(idx: InvertedIndex, blocks: Dataset[PostingBlocks.Block],
      queryString: String, model: ScoreModel, boosts: Seq[Double] = Nil, k: Int = 10,
      blockSize: Long = PostingBlocks.DefaultBlockSize, probeBlocks: Int = 8,
      maxCollectedExpansions: Int = 4096,
      tokenizer: String => IndexedSeq[String] = Analyzer.tokenizeRaw): DataFrame = {
    require(k > 0, "block-max path is top-k only")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val fb = if (boosts.isEmpty) Seq.fill(idx.numFields)(1.0) else boosts

    if (idx.hasTombstones) // stale df ⇒ UB unsound; exhaustive handles it
      return QueryEngine.query(idx, queryString, model, fb, k, tokenizer = tokenizer)
    if (fb.exists(_ < 0)) // negative boost ⇒ tfn⁺·boost is no longer an
      // upper bound (it UNDERestimates the most-negative contribution),
      // so pruning could drop true top-k docs; exhaustive path accepts
      // negative boosts like the reference's fields_boost does
      return QueryEngine.query(idx, queryString, model, fb, k, tokenizer = tokenizer)

    val raw = tokenizer(queryString)
    val qterms = raw.zipWithIndex.collect { case (t, i) if t.nonEmpty => (i, t) }
    if (qterms.isEmpty)
      return QueryEngine.query(idx, queryString, model, fb, k, tokenizer = tokenizer)

    // resolve expansions against the dictionary; need them collected to
    // broadcast per-term UB factors into the block metadata scan
    val prefixPred = qterms.map { case (_, t) => col("term").startsWith(lit(t)) }.reduce(_ || _)
    val qdf = qterms.toSeq.toDF("qti", "qterm")
    val expAll = idx.termdict.filter(prefixPred)
      .join(broadcast(qdf), col("term").startsWith(col("qterm")))
      .select(col("qti"), col("qterm"), col("term").as("exp_term"),
        col("df").cast("long").as("df"))
    val collected = expAll.limit(maxCollectedExpansions + 1).collect()
    if (collected.isEmpty) return QueryEngine.query(idx, queryString, model, fb, k, tokenizer = tokenizer)
    if (collected.length > maxCollectedExpansions)
      return QueryEngine.query(idx, queryString, model, fb, k, tokenizer = tokenizer)

    val expDf = collected.toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toDF("qti", "qterm", "exp_term", "df")
    val stats = idx.fieldStats()
    // per-model precalc + block bound via the SAME column expressions as
    // the scorer (bit-equal); a model without a sound metadata bound
    // answers None → exhaustive path (scorer-generic, like the reference
    // query loop)
    val expWithCols = model.expansionColumns(expDf, stats)
    val ubCol = model.blockUpperBound(stats, fb, raw.length, idx.numFields) match {
      case Some(c) => c
      case None =>
        return QueryEngine.query(idx, queryString, model, fb, k, tokenizer = tokenizer)
    }
    val eterms = collected.map(_.getString(2)).distinct.toSeq

    // ---- block metadata → per-range upper bounds ----
    val meta = blocks.toDF().filter(col("term").isin(eterms: _*))
      .select(col("term"), col("block_id"), col("max_tf"), col("min_fl"))
      .join(broadcast(expWithCols), col("term") === col("exp_term"))
      .select(col("block_id"), col("qti"), ubCol.as("ub"))
    val rangeUb = meta
      .groupBy(col("block_id"), col("qti")).agg(max(col("ub")).as("mub"))
      .groupBy(col("block_id")).agg(sum(col("mub")).as("ub"))

    // ---- phase 1: θ from the highest-UB ranges ----
    val probeIds = rangeUb.orderBy(col("ub").desc, col("block_id").asc)
      .limit(probeBlocks).select("block_id").collect().map(_.getLong(0)).toSeq
    val probeCand = PostingBlocks.toPostings(
      blocks.toDF().filter(col("term").isin(eterms: _*) &&
        col("block_id").isin(probeIds: _*)),
      idx.numFields, blockSize)
    val probeScores = QueryEngine.scoreCandidates(
      idx, probeCand, expDf, model, fb, raw.length, k)
    val probed = probeScores.collect()
    val theta = if (probed.length >= k) probed(k - 1).getDouble(1) else Double.NegativeInfinity

    // ---- phase 2+3: prune ranges by θ, decode survivors, exact top-k ----
    val survivors = rangeUb.filter(col("ub") >= theta).select("block_id")
    val cand = PostingBlocks.toPostings(
      blocks.toDF().filter(col("term").isin(eterms: _*))
        .join(broadcast(survivors), Seq("block_id"), "left_semi"),
      idx.numFields, blockSize)
    QueryEngine.scoreCandidates(idx, cand, expDf, model, fb, raw.length, k)
  }

  /** NOISE-FREE pruning diagnostics: re-runs phases 1–2 of [[query]] for
    * the same inputs and reports `(totalRanges, survivingRanges, theta)` —
    * the algorithmic effect of a bound change, independent of host timing
    * noise (this VM swings 5×). None when the query would fall back to the
    * exhaustive path.
    */
  def pruningStats(idx: InvertedIndex, blocks: Dataset[PostingBlocks.Block],
      queryString: String, model: ScoreModel, boosts: Seq[Double] = Nil,
      k: Int = 10, blockSize: Long = PostingBlocks.DefaultBlockSize,
      probeBlocks: Int = 8, maxCollectedExpansions: Int = 4096,
      tokenizer: String => IndexedSeq[String] = Analyzer.tokenizeRaw): Option[(Long, Long, Double)] = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val fb = if (boosts.isEmpty) Seq.fill(idx.numFields)(1.0) else boosts
    if (idx.hasTombstones || fb.exists(_ < 0)) return None
    val raw = tokenizer(queryString)
    val qterms = raw.zipWithIndex.collect { case (t, i) if t.nonEmpty => (i, t) }
    if (qterms.isEmpty) return None
    val prefixPred = qterms.map { case (_, t) => col("term").startsWith(lit(t)) }.reduce(_ || _)
    val qdf = qterms.toSeq.toDF("qti", "qterm")
    val collected = idx.termdict.filter(prefixPred)
      .join(broadcast(qdf), col("term").startsWith(col("qterm")))
      .select(col("qti"), col("qterm"), col("term").as("exp_term"),
        col("df").cast("long").as("df"))
      .limit(maxCollectedExpansions + 1).collect()
    if (collected.isEmpty || collected.length > maxCollectedExpansions) return None
    val expDf = collected.toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toDF("qti", "qterm", "exp_term", "df")
    val stats = idx.fieldStats()
    val expWithCols = model.expansionColumns(expDf, stats)
    val ubCol = model.blockUpperBound(stats, fb, raw.length, idx.numFields)
      .getOrElse(return None)
    val eterms = collected.map(_.getString(2)).distinct.toSeq
    val meta = blocks.toDF().filter(col("term").isin(eterms: _*))
      .select(col("term"), col("block_id"), col("max_tf"), col("min_fl"))
      .join(broadcast(expWithCols), col("term") === col("exp_term"))
      .select(col("block_id"), col("qti"), ubCol.as("ub"))
    val rangeUb = meta
      .groupBy(col("block_id"), col("qti")).agg(max(col("ub")).as("mub"))
      .groupBy(col("block_id")).agg(sum(col("mub")).as("ub"))
      .cache()
    val total = rangeUb.count()
    val probeIds = rangeUb.orderBy(col("ub").desc, col("block_id").asc)
      .limit(probeBlocks).select("block_id").collect().map(_.getLong(0)).toSeq
    val probeCand = PostingBlocks.toPostings(
      blocks.toDF().filter(col("term").isin(eterms: _*) &&
        col("block_id").isin(probeIds: _*)),
      idx.numFields, blockSize)
    val probed = QueryEngine.scoreCandidates(
      idx, probeCand, expDf, model, fb, raw.length, k).collect()
    val theta = if (probed.length >= k) probed(k - 1).getDouble(1) else Double.NegativeInfinity
    val survivors = rangeUb.filter(col("ub") >= theta).count()
    rangeUb.unpersist()
    Some((total, survivors, theta))
  }
}
