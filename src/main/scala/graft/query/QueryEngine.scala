package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.analysis.Analyzer
import graft.index.InvertedIndex
import graft.score.ScoreModel

/** Free-text disjunctive query over an [[InvertedIndex]] — the Spark-native
  * re-expression of reference `Index::query`
  * (/root/reference/src/query.rs:17-106):
  *
  * {{{
  *   query string ── tokenize (driver, trivial)
  *   term_dict  ⋈_startsWith broadcast(query terms)   → expansions
  *              (reference expand_term, query.rs:108-147: trie prefix DFS
  *               ≡ prefix predicate on the term dictionary)
  *   postings   ── filter(term/bucket IN expansions, or prefix-OR)
  *              ── anti ⋈ tombstones                  (skipped when none)
  *              ⋈ broadcast(expansions + per-term precalc columns)
  *              ── ScoreModel.score                   (one shuffle on doc_id)
  *              ── orderBy(score desc, doc_id asc)    (top-k ⇒
  *                                                     TakeOrderedAndProject)
  * }}}
  *
  * Expansion resolution runs against the term DICTIONARY first (tiny
  * relative to postings — one row per distinct term). When the expansion
  * set fits under `maxCollectedExpansions` it is collected and the posting
  * scan gets literal `bucket IN (…) AND term IN (…)` predicates — on a
  * persisted index (hash-bucketed by term, [[graft.index.IndexCatalog]])
  * that is PARTITION PRUNING: a query touches only the buckets of its
  * expanded terms, not the 10^12-row posting store. Pathologically broad
  * prefixes fall back to a non-collected plan with a `startsWith` scan
  * predicate, preserving the reference's unbounded-expansion semantics.
  *
  * The query side is always tiny, so every join against postings is a
  * broadcast hash join — the only exchange over big data is the final
  * per-doc aggregation.
  */
object QueryEngine {

  val resultSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  private def emptyResult(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], resultSchema)

  /** All matched documents with scores, ordered by the canonical total
    * order (score desc, doc_id asc — the reference harness tiebreak,
    * /root/reference/src/lib.rs:54-58). Pass `limit > 0` for top-k (the
    * reference returns all matches; query.rs:103).
    */
  def query(idx: InvertedIndex, queryString: String, model: ScoreModel,
      boosts: Seq[Double] = Nil, limit: Int = -1,
      maxCollectedExpansions: Int = 4096,
      tokenizer: String => IndexedSeq[String] = Analyzer.tokenizeRaw): DataFrame = {
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val fb = if (boosts.isEmpty) Seq.fill(idx.numFields)(1.0) else boosts
    require(fb.size == idx.numFields, "one boost per field")

    // Reference query.rs:29-35: raw token count (incl. empties) feeds
    // query_terms_len; empty terms are skipped in the scoring loop. The
    // tokenizer must match the one the index was built with (reference
    // passes it per query call, /root/reference/src/query.rs:24).
    val raw = tokenizer(queryString)
    val qterms = raw.zipWithIndex.collect { case (t, i) if t.nonEmpty => (i, t) }
    if (qterms.isEmpty) return emptyResult(spark)

    val prefixPred = qterms.map { case (_, t) => col("term").startsWith(lit(t)) }.reduce(_ || _)
    val hasBucket = idx.postings.columns.contains("bucket")
    val qdf = qterms.toSeq.toDF("qti", "qterm")

    // Resolve the expansion sets against the dictionary (reference
    // expand_term). Collected when small → literal pruning predicates.
    val bucketCol = if (idx.termdict.columns.contains("bucket")) col("bucket") else lit(-1)
    val expAll = idx.termdict.filter(prefixPred)
      .join(broadcast(qdf), col("term").startsWith(col("qterm")))
      .select(col("qti"), col("qterm"), col("term").as("exp_term"),
        col("df").cast("long").as("df"), bucketCol.cast("int").as("bucket"))
    val collected = expAll.limit(maxCollectedExpansions + 1).collect()

    val (cand0, exp) =
      if (collected.length <= maxCollectedExpansions) {
        if (collected.isEmpty) return emptyResult(spark)
        val eterms = collected.map(_.getString(2)).distinct.toSeq
        val termPred = col("term").isin(eterms: _*)
        val pred =
          if (hasBucket) col("bucket").isin(collected.map(_.getInt(4)).distinct.toSeq: _*) && termPred
          else termPred
        val expDf = collected.toSeq
          .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
          .toDF("qti", "qterm", "exp_term", "df")
        (idx.livePostings.filter(pred), expDf)
      } else {
        // unbounded expansion: keep everything as a DataFrame
        (idx.livePostings.filter(prefixPred),
          expAll.select(col("qti"), col("qterm"), col("exp_term"), col("df")))
      }

    // With tombstones present the dictionary df is stale: recount over LIVE
    // candidate postings (reference count_documents skips removed pointers
    // at query time, /root/reference/src/index.rs:281-297). Terms whose
    // live df hits 0 drop out — same as the reference's df>0 guard.
    val expLive =
      if (idx.hasTombstones) {
        val liveDf = cand0.groupBy(col("term")).agg(sum(col("occ")).as("ldf"))
        exp.drop("df").join(liveDf, col("exp_term") === col("term"))
          .select(col("qti"), col("qterm"), col("exp_term"), col("ldf").as("df"))
      } else exp

    scoreCandidates(idx, cand0, expLive, model, fb, raw.length, limit)
  }

  /** Score a candidate-postings DataFrame against a resolved expansion set:
    * the shared tail of the exhaustive path and [[BlockMaxTopK]].
    */
  private[graft] def scoreCandidates(idx: InvertedIndex, cand: DataFrame,
      exp: DataFrame, model: ScoreModel, fb: Seq[Double], qlenRaw: Int,
      limit: Int): DataFrame = {
    val stats = idx.fieldStats()
    val expCols = model.expansionColumns(exp, stats)
    val joined = cand.join(broadcast(expCols), col("term") === col("exp_term"))
    val scored = model.score(joined, stats, fb, qlenRaw, idx.numFields)
      .orderBy(col("score").desc, col("doc_id").asc)
    if (limit > 0) scored.limit(limit) else scored
  }

  /** Reference `expand_term` (/root/reference/src/query.rs:108-147): every
    * indexed term having `term` as prefix and at least one live posting.
    * (The reference's trie-DFS order is insertion-dependent; we canonicalize
    * to lexicographic.)
    */
  def expandTerm(idx: InvertedIndex, term: String): DataFrame = {
    val dict =
      if (idx.hasTombstones)
        idx.livePostings.filter(col("term").startsWith(lit(term)))
          .groupBy(col("term")).agg(sum(col("occ")).as("df"))
      else idx.termdict.filter(col("term").startsWith(lit(term)))
    dict.filter(col("df") > 0).select(col("term")).orderBy(col("term"))
  }
}
