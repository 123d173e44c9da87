package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** PERCOLATION — reverse search ("which registered queries match this
  * document?"), the alerting/routing primitive: queries are registered
  * up front, documents arrive one at a time (often as a stream), and each
  * doc is emitted once per matching query.
  *
  * Matching semantics mirror the forward engine's term semantics — a query
  * term matches a doc iff some token of some field has it as a PREFIX —
  * with `requireAll` choosing conjunctive (every term must match; the
  * alerting norm, default) or disjunctive (any term) composition.
  *
  * Scale/stream shape: the query set is driver-known (it is the alert
  * configuration), so the whole match compiles into ONE codegen'd
  * per-row expression — tokenize once per doc, one boolean per (query,
  * term) over the token array, `explode` of the matched-qid array. No
  * index, no join, no shuffle, NO STATE: the same frame works on a
  * `readStream` source in append mode (PercolatorSpec pins streaming ==
  * batch). Cost is O(tokens × Σ query terms) per doc — the right trade up
  * to thousands of registered queries; a query set past what one
  * expression should hold (tens of thousands) belongs in the join form:
  * explode doc tokens and broadcast-join a (qid, term) table, which is the
  * same plan [[QueryEngine.batchQuery]]'s fallback uses. The expression
  * form is the deployment default because it keeps percolation usable
  * directly inside `readStream.select(...)` with zero shuffle.
  */
object Percolator {

  /** One boolean column: does `toks` satisfy the query under the given
    * composition rule?
    */
  private def matches(toks: Column, terms: Seq[String],
      requireAll: Boolean): Column = {
    val per = terms.map(t => exists(toks, x => x.startsWith(lit(t))))
    if (requireAll) per.reduce(_ && _) else per.reduce(_ || _)
  }

  /** Add the matched query ids to each doc: output `(doc_id, qid)`, one
    * row per (document, matching query). Empty-term queries are dropped
    * from the registration (an all-empty query matches nothing).
    *
    * @param fieldCols a term may match in ANY field (matching is per doc;
    *                  fields are searched independently, like the forward
    *                  engine's per-field scoring)
    * @param tokensCol the tokenizer the deployment indexes with, so
    *                  percolation agrees with what a forward query of the
    *                  same string would have matched
    */
  def percolate(docs: DataFrame, docIdCol: String, fieldCols: Seq[String],
      queries: Seq[(Long, String)], requireAll: Boolean = true,
      tokenizer: String => IndexedSeq[String] = Analyzer.tokenizeRaw,
      tokensCol: Column => Column = Analyzer.tokensCol): DataFrame = {
    require(fieldCols.nonEmpty, "at least one field")
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids")
    // -1 is the internal no-match sentinel removed below; a query
    // registered under it would silently never emit a row
    require(queries.forall(_._1 != -1L), "query id -1 is reserved")
    val qs = queries
      .map { case (qid, q) => (qid, tokenizer(q).filter(_.nonEmpty)) }
      .filter(_._2.nonEmpty)
    if (qs.isEmpty)
      return docs.select(col(docIdCol).cast("long").as("doc_id"),
        lit(-1L).as("qid")).filter(lit(false))
    val toks = col("_toks")
    val matchedQids = array(qs.map { case (qid, terms) =>
      when(matches(toks, terms, requireAll), lit(qid)).otherwise(lit(-1L))
    }: _*)
    docs
      // bind the token array once; the per-query lambdas index it instead
      // of re-tokenizing (higher-order functions get no subexpression
      // elimination — same discipline as Snippets/Portable)
      .withColumn("_toks",
        concat(fieldCols.map(f => tokensCol(col(f))): _*))
      .select(col(docIdCol).cast("long").as("doc_id"),
        explode(array_remove(matchedQids, -1L)).as("qid"))
  }
}
