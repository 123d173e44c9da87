package graft.score

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.FieldStats

/** One score entry per (doc, field, query term, expanded term) — the
  * reference `ScoreByTerm` (/root/reference/src/score/default/zero_to_one.rs:27-34).
  * The reference pushes one entry per posting POINTER (per occurrence); the
  * duplicates are provably inert in the greedy pass (the first entry of a
  * (qti, node) pair either consumes the qti or is pool-skipped; identical
  * copies then always skip), so we carry distinct entries only.
  */
private[graft] final case class ZEntry(
    doc_id: Long, field: Int, score: Double, qti: Int, node: String,
    tf: Int, fl: Int)

/** Batched-scoring entry: [[ZEntry]] plus the query id and that query's raw
  * token count (constant within a (qid, doc, field) group).
  */
private[graft] final case class ZBatchEntry(
    qid: Long, qlen: Int, doc_id: Long, field: Int, score: Double, qti: Int,
    node: String, tf: Int, fl: Int)

/** The zero-to-one normalized scorer
  * (/root/reference/src/score/default/zero_to_one.rs:24-127).
  *
  * `score()` in the reference only COLLECTS entries; the real computation is
  * the `finalize` greedy pass per (doc, field): sort entries by score desc,
  * walk them once — skip if the query term was already consumed; per
  * expanded term keep a "df pool" that starts at `tf − 1` on first touch
  * (first touch always consumes, no pool check) and decrements on later
  * touches, skipping WITHOUT consuming the query term when exhausted; each
  * consumed entry contributes `min(score/tf, 1) · tf / max(fl, qlen)`.
  * The doc score is the max over its field scores (zero_to_one.rs:122).
  *
  * That loop is inherently sequential per (doc, field) and order-dependent,
  * so it runs as a `groupByKey(...).mapGroups` — a holistic aggregate over
  * groups whose size is bounded by (#expansions × #query terms), never by
  * corpus size, so it scales. Tie order within equal scores is the
  * reference's insertion order (qti asc, then trie-DFS); we fix the
  * deterministic tiebreak (score desc, qti asc, expanded-term asc) per
  * SURVEY.md §2.3(7) — it reproduces every published test vector.
  */
final case class ZeroToOne() extends ScoreModel {

  override def expansionColumns(exp: DataFrame, stats: FieldStats): DataFrame = {
    // 1 − |len(exp) − len(term)| / len(exp), UTF-8 byte lengths
    // (zero_to_one.rs:57-58,72). Always > 0 because expansion ⇒ prefix ⇒
    // len(exp) ≥ len(term). FUZZY expansions (an `edist` column, see
    // graft.query.QueryEngine.query) use 1 − editDistance/len(exp) — equal
    // on prefix pairs (where editDistance = the byte-length difference)
    // and well-defined for substitutions/deletions; can reach 0 for an
    // expansion as short as its distance, which contributes 0 (inert in
    // the greedy pass).
    val le = Analyzer.byteLen(col("exp_term")).cast("double")
    val lt = Analyzer.byteLen(col("qterm")).cast("double")
    val entscore =
      if (exp.columns.contains("edist"))
        lit(1.0) - col("edist").cast("double") / le
      else lit(1.0) - abs(le - lt) / le
    exp.withColumn("entscore", entscore)
  }

  /** Per-expansion block bound for the greedy finalize: one consumed entry
    * contributes `min(s/tf,1)·tf / max(fl,qlen) = min(s,tf)/max(fl,qlen)`
    * with `fl ≥ tf`, so it is ≤ `min(s,tf)/max(tf,qlen) ≤ s/max(s,qlen)
    * ≤ s/qlen` (s = entscore ≤ 1, qlen ≥ 1), and a query term consumes at
    * most one entry per field; the doc score is a MAX over fields. Hence
    * `entscore/qlen` bounds any single expansion's contribution — no block
    * metadata needed at all. Enables WAND pruning for zero-to-one (the
    * reference query loop is scorer-generic).
    */
  override def blockUpperBound(stats: FieldStats, boosts: Seq[Double],
      qlenRaw: Int, numFields: Int): Option[org.apache.spark.sql.Column] =
    Some(col("entscore") / lit(math.max(qlenRaw, 1).toDouble))

  override def score(joined: DataFrame, stats: FieldStats, boosts: Seq[Double],
      qlenRaw: Int, numFields: Int): DataFrame = {
    val spark = joined.sparkSession
    import spark.implicits._
    val entries = joined
      .select(col("doc_id"), col("qti"), col("exp_term"), col("entscore"),
        col("fl"), posexplode(col("tf")).as(Seq("pos", "tfx")))
      .filter(col("tfx") > 0)
      .select(col("doc_id"), col("pos").cast("int").as("field"),
        col("entscore").as("score"), col("qti"), col("exp_term").as("node"),
        col("tfx").as("tf"), element_at(col("fl"), col("pos") + 1).as("fl"))
      .as[ZEntry]

    entries
      .groupByKey(e => (e.doc_id, e.field))
      .mapGroups((key: (Long, Int), it: Iterator[ZEntry]) =>
        (key._1, ZeroToOne.fieldScore(it.toIndexedSeq, qlenRaw)))
      .toDF("doc_id", "_fscore")
      .groupBy(col("doc_id")).agg(max(col("_fscore")).as("score"))
  }

  /** Batched: the same greedy finalize per (qid, doc, field) group — the
    * group key gains the query id and `qlen` rides each entry (it is
    * constant within a group), so per-query results are identical to
    * [[score]]'s (BatchQuerySpec). Group size stays bounded by
    * (#expansions × #query terms) of ONE query, never by batch size.
    */
  override def scoreBatch(joined: DataFrame, stats: FieldStats,
      boosts: Seq[Double], numFields: Int): DataFrame = {
    val spark = joined.sparkSession
    import spark.implicits._
    val entries = joined
      .select(col("qid"), col("qlen").cast("int").as("qlen"), col("doc_id"),
        col("qti"), col("exp_term"), col("entscore"), col("fl"),
        posexplode(col("tf")).as(Seq("pos", "tfx")))
      .filter(col("tfx") > 0)
      .select(col("qid"), col("qlen"), col("doc_id"),
        col("pos").cast("int").as("field"), col("entscore").as("score"),
        col("qti"), col("exp_term").as("node"), col("tfx").as("tf"),
        element_at(col("fl"), col("pos") + 1).as("fl"))
      .as[ZBatchEntry]
    entries
      .groupByKey(e => (e.qid, e.doc_id, e.field))
      .mapGroups { (key: (Long, Long, Int), it: Iterator[ZBatchEntry]) =>
        val es = it.toIndexedSeq
        (key._1, key._2, ZeroToOne.fieldScore(
          es.map(e => ZEntry(e.doc_id, e.field, e.score, e.qti, e.node,
            e.tf, e.fl)), es.head.qlen))
      }
      .toDF("qid", "doc_id", "_fscore")
      .groupBy(col("qid"), col("doc_id")).agg(max(col("_fscore")).as("score"))
  }
}

object ZeroToOne {

  /** The reference finalize greedy loop for one (doc, field) group
    * (zero_to_one.rs:84-126), verbatim semantics. (private[graft]: the
    * 2-query-term closed-form reduction used by the q35 oracle is
    * property-tested directly against this loop.)
    */
  private[graft] def fieldScore(entries: IndexedSeq[ZEntry], qlenRaw: Int): Double = {
    val sorted = entries.sortBy(e => (-e.score, e.qti, e.node))
    val pool = mutable.HashMap.empty[String, Int]
    val consumedQ = mutable.HashSet.empty[Int]
    var s = 0.0
    for (e <- sorted) {
      if (!consumedQ.contains(e.qti)) {
        val take = pool.get(e.node) match {
          case Some(p) if p <= 0 => false // pool exhausted: skip WITHOUT
          // consuming the query term (zero_to_one.rs:104-108)
          case Some(p) => pool(e.node) = p - 1; true
          case None => pool(e.node) = e.tf - 1; true // first touch always
          // consumes, no pool check (zero_to_one.rs:110-113)
        }
        if (take) {
          consumedQ += e.qti
          s += math.min(e.score / e.tf.toDouble, 1.0) * e.tf.toDouble /
            math.max(e.fl, qlenRaw).toDouble
        }
      }
    }
    s
  }
}
