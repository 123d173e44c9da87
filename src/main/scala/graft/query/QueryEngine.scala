package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *               ≡ prefix predicate on the sorted dictionary; a tiny
  *               broadcast-nested-loop join, one dictionary scan)
  *   postings   ── filter(prefix-OR)                  (pushed to the scan /
  *                                                     partition-pruned on a
  *                                                     persisted index)
  *              ── anti ⋈ tombstones                  (skipped when none)
  *              ⋈ broadcast(expansions + per-term precalc columns)
  *              ── ScoreModel.score                   (one shuffle on doc_id)
  *              ── orderBy(score desc, doc_id asc)    (top-k ⇒
  *                                                     TakeOrderedAndProject)
  * }}}
  *
  * The query side is always tiny (a handful of terms × their expansions),
  * so every join against postings is a broadcast hash join — no shuffle of
  * the big table; the only exchange is the final per-doc aggregation.
  */
object QueryEngine {

  val resultSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** All matched documents with scores, ordered by the canonical total
    * order (score desc, doc_id asc — the reference harness tiebreak,
    * /root/reference/src/lib.rs:54-58). Pass `limit > 0` for top-k (the
    * reference returns all matches; query.rs:103).
    */
  def query(idx: InvertedIndex, queryString: String, model: ScoreModel,
      boosts: Seq[Double] = Nil, limit: Int = -1): DataFrame = {
    val spark = idx.postings.sparkSession
    val fb = if (boosts.isEmpty) Seq.fill(idx.numFields)(1.0) else boosts
    require(fb.size == idx.numFields, "one boost per field")

    // Reference query.rs:29-35: raw token count (incl. empties) feeds
    // query_terms_len; empty terms are skipped in the scoring loop.
    val raw = Analyzer.tokenizeRaw(queryString)
    val qterms = raw.zipWithIndex.collect { case (t, i) if t.nonEmpty => (i, t) }
    if (qterms.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], resultSchema)

    val prefixPred = qterms.map { case (_, t) => col("term").startsWith(lit(t)) }.reduce(_ || _)

    // Candidate postings: prefix-pruned scan, tombstones anti-joined.
    val cand = idx.livePostings.filter(prefixPred)

    // Expansions with LIVE df. With no tombstones the prebuilt dictionary df
    // is already live; with tombstones present df must be recounted over
    // live postings (reference count_documents skips removed pointers at
    // query time, /root/reference/src/index.rs:281-297). Either way the
    // recount runs on the pruned candidate set only.
    val liveDict =
      if (idx.hasTombstones) cand.groupBy(col("term")).agg(sum(col("occ")).as("df"))
      else idx.termdict.filter(prefixPred)

    import spark.implicits._
    val qdf = qterms.toSeq.toDF("qti", "qterm")
    val exp = liveDict
      .join(broadcast(qdf), col("term").startsWith(col("qterm")))
      .select(col("qti"), col("qterm"), col("term").as("exp_term"), col("df"))

    val stats = idx.fieldStats()
    val expCols = model.expansionColumns(exp, stats)

    val joined = cand.join(broadcast(expCols), col("term") === col("exp_term"))

    val scored = model.score(joined, stats, fb, raw.length, idx.numFields)
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
