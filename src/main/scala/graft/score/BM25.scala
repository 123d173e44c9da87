package graft.score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.FieldStats

/** Okapi BM25 — semantics replicated from
  * /root/reference/src/score/default/bm25.rs (defaults k1=1.2, b=0.75,
  * bm25.rs:21-26), as pure codegen'd column expressions: no UDF, no UDAF.
  *
  * Exact formulas (must stay bit-faithful, see SURVEY.md §2.3):
  *  - `f = min(N, df)` with OCCURRENCE-counted df (bm25.rs:41; the clamp is
  *    pinned by /root/reference/tests/document_frequency.rs).
  *  - `idf = ln(1 + (N − f + 0.5)/(f + 0.5))` (bm25.rs:56).
  *  - expansion boost: exact match → 1.0, else
  *    `ln(1 + 1/(1 + len(exp) − len(term)))` with UTF-8 BYTE lengths
  *    (bm25.rs:44-55).
  *  - per-field: `tfn = ((k1+1)·tf) / (k1·((1−b) + b·fl/avg) + tf)`,
  *    contribution `tfn · idf · boost(x) · expansionBoost`, summed over
  *    fields in field order, row dropped when the sum ≤ 0 (bm25.rs:60-93).
  *  - merge: max over a query term's expansions, then sum across query
  *    terms folded in ascending `qti` order.
  *
  * DELIBERATE DIVERGENCE from the reference merge rule: the reference
  * `max_score_merger` (/root/reference/src/query.rs:150-164) keeps ONE
  * running total per doc and, for a doc already visited by an earlier
  * expansion of the CURRENT query term, folds `max(running_total, score)` —
  * i.e. the max is taken against the accumulated CROSS-TERM total, in
  * trie-DFS expansion order, which depends on document INSERTION order
  * (trie children are prepended, /root/reference/src/index.rs:421-433). For
  * multi-term prefix queries where a later-visited expansion alone outscores
  * the running total (e.g. "spar s"), the reference result is therefore a
  * function of ingestion order — no deterministic relational plan can
  * reproduce it in general. We canonicalize to the order-independent
  *   score(doc) = Σ_{query terms} max_{expansions} termScore
  * which equals the reference fold whenever expansion order is benign
  * (all published reference vectors reproduce at 1e-8, GoldenBm25Spec) and
  * is the documented intent of the merger ("max score per query term,
  * summed"). Pinned by EdgeCaseSpec "merge rule canonicalization".
  *
  * FIELD COMBINATION (`tieBreaker`): by default per-field contributions are
  * SUMMED in field order (the reference rule above). `tieBreaker = Some(t)`
  * switches to DIS-MAX — `best + t·(Σ − best)` over the per-field
  * contributions — the standard multi-field rule when fields are
  * alternative representations of the same text (title/body) rather than
  * independent evidence: a doc is ranked by its best field, with the
  * others worth a fraction `t`. `t = 1` IS the sum; `t = 0` is pure max.
  * The reference is single-rule (sum); dis-max is a pure extension on the
  * same per-field tfn columns. WAND STAYS SOUND UNDER DIS-MAX with the
  * unchanged Σ-shaped [[blockUpperBound]]: for t ∈ [0,1] and non-negative
  * parts, best + t·(Σ − best) ≤ Σ, so the summed bound dominates every
  * dis-max score (pinned by DisMaxSpec).
  */
final case class BM25(k1: Double = 1.2, b: Double = 0.75,
    tieBreaker: Option[Double] = None) extends ScoreModel {
  require(tieBreaker.forall(t => t >= 0.0 && t <= 1.0),
    "tieBreaker must be in [0, 1] (1 = field sum, 0 = pure max)")

  override def expansionColumns(exp: DataFrame, stats: FieldStats): DataFrame = {
    val n = stats.n
    val f = least(lit(n), col("df"))
    val idf = log(lit(1.0) + ((lit(n) - f).cast("double") + lit(0.5)) / (f.cast("double") + lit(0.5)))
    // FUZZY expansions (an `edist` column resolved by
    // graft.query.QueryEngine) generalize the reference boost along the
    // axis it already measures: a prefix expansion is exactly
    // `len(exp) − len(term)` INSERTIONS from the query term — its edit
    // distance — so `ln(1 + 1/(1 + editDistance))` reduces to the formula
    // below on every prefix pair while staying finite for substitutions
    // and deletions (where the byte-length difference can be 0 or < 0 and
    // the reference formula would blow up). Prefix queries never carry the
    // column, so their boosts stay bit-faithful to bm25.rs:44-55.
    val eboost =
      if (exp.columns.contains("edist"))
        when(col("edist") === 0, lit(1.0)).otherwise(
          log(lit(1.0) + lit(1.0) / (lit(1.0) + col("edist").cast("double"))))
      else
        when(col("exp_term") === col("qterm"), lit(1.0)).otherwise(
          log(lit(1.0) + lit(1.0) /
            (lit(1.0) + Analyzer.byteLen(col("exp_term")).cast("double")
              - Analyzer.byteLen(col("qterm")).cast("double"))))
    exp.withColumn("idf", idf).withColumn("eboost", eboost)
  }

  /** Per-expansion block bound over (max_tf, min_fl) metadata: the tf-norm
    * `tfn(t, l) = (k1+1)·t / (k1·((1−b) + b·l/avg) + t)` is increasing in t
    * and decreasing in l, so `tfn(maxTf_x, minFl_x)` dominates every
    * matching entry's field-x norm (min_fl is taken over tf>0 entries
    * only — see [[graft.index.PostingBlocks.Block]]); tf=0 entries
    * contribute 0. Hence Σ_x boost_x·tfn(maxTf_x, minFl_x) · idf · eboost ≥
    * any doc's term score in the block. Strictly tighter than the fl-free
    * `tfn⁺` limit (which is the l→0 edge of the same expression) — under
    * length-skewed corpora the fl-free bound chases blocks whose real
    * length-normalized scores are mediocre (measured, BENCH.md round-3
    * skew experiment). Requires non-negative boosts (the caller guards).
    */
  override def blockUpperBound(stats: FieldStats, boosts: Seq[Double],
      qlenRaw: Int, numFields: Int): Option[Column] = {
    val perField = (0 until numFields).map { x =>
      val tf = element_at(col("max_tf"), x + 1).cast("double")
      val fl = element_at(col("min_fl"), x + 1).cast("double")
      // an all-empty field (avg 0) has maxTf 0 everywhere; fall back to the
      // fl-free norm floor rather than dividing by zero into NaN bounds
      val norm =
        if (stats.avgs(x) == 0.0) lit(1.0 - b)
        else lit(1.0 - b) + lit(b) * (fl / lit(stats.avgs(x)))
      (lit(k1 + 1.0) * tf) / (lit(k1) * norm + tf) * lit(boosts(x))
    }
    Some(perField.reduce(_ + _) * col("idf") * col("eboost"))
  }

  override def score(joined: DataFrame, stats: FieldStats, boosts: Seq[Double],
      qlenRaw: Int, numFields: Int): DataFrame =
    scoreKeyed(joined, stats, boosts, numFields, Nil)

  /** Batched: identical expressions and fold order, keyed by (qid, doc_id)
    * — per-query scores are bit-identical to [[score]]'s (BatchQuerySpec).
    */
  override def scoreBatch(joined: DataFrame, stats: FieldStats,
      boosts: Seq[Double], numFields: Int): DataFrame =
    scoreKeyed(joined, stats, boosts, numFields, Seq("qid"))

  /** Per-(posting, expansion) term score — the shared column every scoring
    * shape (single, batched, explain) is built from, so they cannot drift:
    * Σ_fields tfn·idf·boost_x·eboost (bm25.rs:60-93).
    */
  private def termScoreCol(stats: FieldStats, boosts: Seq[Double],
      numFields: Int): Column = {
    val parts = (0 until numFields).map { x =>
      val tf = element_at(col("tf"), x + 1).cast("double")
      val fl = element_at(col("fl"), x + 1).cast("double")
      val tfn = (lit(k1 + 1.0) * tf) /
        (lit(k1) * (lit(1.0 - b) + lit(b) * (fl / lit(stats.avgs(x)))) + tf)
      when(tf > 0, tfn * col("idf") * lit(boosts(x)) * col("eboost"))
        .otherwise(lit(0.0))
    }
    tieBreaker match {
      // reference rule: plain field sum, expression unchanged (bit-faithful)
      case None => parts.reduce(_ + _)
      case Some(t) =>
        val sum = parts.reduce(_ + _)
        val best = if (parts.size == 1) parts.head else greatest(parts: _*)
        best + lit(t) * (sum - best)
    }
  }

  /** BM25's score IS Σ_queryTerms max_expansions, so the per-term breakdown
    * is the scoring pipeline stopped before the final sum: for each
    * (doc, qti) the winning expansion row, chosen by (micro-rounded term
    * score desc, exp_term asc) — the micro rounding makes the argmax stable
    * across engines when two expansions score within 1e-6 (the external
    * oracle applies the identical rule).
    */
  override def termContributions(joined: DataFrame, stats: FieldStats,
      boosts: Seq[Double], numFields: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("qti"))
      .orderBy(round(col("_ts") * lit(1e6)).cast("long").desc,
        col("exp_term").asc)
    joined
      .withColumn("_ts", termScoreCol(stats, boosts, numFields))
      .filter(col("_ts") > 0)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("qti"), col("qterm"),
        col("exp_term").as("best_term"), col("_ts").as("term_score"))
  }

  /** The scoring pipeline, grouped by `keys :+ doc_id`: one code path for
    * the single-query and batched shapes, so they cannot drift.
    */
  private def scoreKeyed(joined: DataFrame, stats: FieldStats,
      boosts: Seq[Double], numFields: Int, keys: Seq[String]): DataFrame = {
    val termScore = termScoreCol(stats, boosts, numFields)
    val keyCols = keys.map(col) :+ col("doc_id")
    joined
      .withColumn("_ts", termScore)
      .filter(col("_ts") > 0)
      // max over this query term's expansion set…
      .groupBy(keyCols :+ col("qti"): _*).agg(max(col("_ts")).as("_mts"))
      // …then sum across query terms, folded in qti order so the f64
      // accumulation order matches the reference's sequential loop.
      .groupBy(keyCols: _*)
      .agg(aggregate(
        sort_array(collect_list(struct(col("qti"), col("_mts")))),
        lit(0.0),
        (acc: Column, e: Column) => acc + e.getField("_mts")).as("score"))
  }
}
