package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Snippet (hit-highlighting) generation: for each document matching a
  * query, the best fixed-width token window — the search-results-page
  * surface the reference leaves to the caller (its API returns bare
  * `(doc_id, score)`, /root/reference/src/query.rs:103-106).
  *
  * Deterministic rule (so an external oracle can recompute it):
  * tokenize the field (same stream as the index), score every window of
  * `window` consecutive tokens by its count of query-term occurrences
  * (exact token match), pick the highest-scoring window, earliest wins
  * ties; emit the window re-joined with single spaces plus its match
  * count. Documents with zero matches are dropped.
  *
  * Scale shape: ONE map-only pass, pure builtin higher-order expressions
  * (`transform`/`slice`/`filter` over the token array) — whole-stage
  * codegen, no UDF, no shuffle, no driver state. Cost per row is
  * O(tokens × window); `window` is a UI constant (10-20). Callers
  * snippet the page of docs being SHOWN, not the corpus: compose as
  * `snippets(docs ⋈ topK(query), …)` so the pass runs over k rows —
  * the corpus-wide form here exists for pipeline use (and the gate).
  */
object Snippets {

  /** Window score: occurrences of any query term among `win` tokens. */
  private def matchCount(win: Column, terms: Seq[String]): Column =
    size(filter(win, t => t.isin(terms.map(lit(_)): _*)))

  /** Add `(snippet, matches)` for the best `window`-token window of
    * `textCol`; rows with no query-term occurrence are dropped.
    *
    * @param tokensCol the tokenizer the index was built with — match
    *                  positions must agree with what the query matched
    */
  def snippets(docs: DataFrame, docIdCol: String, textCol: String,
      queryTerms: Seq[String], window: Int = 12,
      tokensCol: Column => Column = Analyzer.tokensCol): DataFrame = {
    require(window > 0, "window must be positive")
    val terms = queryTerms.filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "at least one query term")
    // tokenize ONCE into a bound column and build every window from the
    // BOUND column — higher-order-function lambdas run outside whole-stage
    // codegen with no subexpression elimination (see Portable.scala), so
    // referencing the raw tokenize expression inside the per-start lambda
    // would re-split the full text once per window offset: O(tokens²)
    // full-text work per doc
    val toks = col("_toks")
    val n = size(toks)
    // window start positions are 1-based (slice is 1-based); short docs
    // (n <= window) get exactly one window covering the whole doc
    val starts = sequence(lit(1), greatest(n - lit(window) + lit(1), lit(1)))
    val scores = transform(starts, i => matchCount(slice(toks, i, lit(window)), terms))
    // The zero-match drop runs as a CHEAP pushable prefilter
    // (`arrays_overlap(tokens, terms)` — exactly equivalent to the old
    // `matches > 0`: a doc contains a query term iff its best window
    // does), NOT as a post-hoc filter on the computed `matches` column:
    // predicate pushdown would carry the whole O(tokens × window) scoring
    // expression below the repartition into the scan stage and serialize
    // it into one task on a one-split input (the §4.4
    // duplicated-evaluation trap, Column flavor). With the prefilter at
    // the scan and the parallelism floor between, the heavy window
    // scoring runs post-exchange across the cluster, once.
    graft.pipeline.Portable.parallelized(
      docs.filter(arrays_overlap(tokensCol(col(textCol)),
        array(terms.map(lit(_)): _*))))
      .withColumn("_toks", tokensCol(col(textCol)))
      .withColumn("_scores", scores)
      .select(col(docIdCol).cast("long").as("doc_id"),
        // array_position returns the FIRST index of the max — earliest
        // window wins ties (deterministic, oracle-recomputable)
        array_join(slice(col("_toks"),
          array_position(col("_scores"), array_max(col("_scores"))).cast("int"),
          lit(window)), " ").as("snippet"),
        array_max(col("_scores")).cast("int").as("matches"))
  }
}
