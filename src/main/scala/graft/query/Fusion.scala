package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-retrieval result-set combinators — the stages a production search
  * deployment runs ON TOP of ranked lists (hybrid lexical+vector fusion,
  * field collapsing, score modifiers). The reference engine has no analog
  * (it is single-list BM25/zero-to-one only); these extend the round-5
  * surface the way a user of Elasticsearch-style `rank`/`collapse`/
  * `function_score` would expect, re-expressed as Catalyst plans.
  *
  * Scale shapes:
  *  - [[rrf]] consumes per-query TOP-K lists (each already cut by the
  *    retrieval stage to k ≈ 10²–10³ rows), so the unpartitioned
  *    `row_number` window is over Σ|lists| ≤ a few thousand rows by
  *    construction — one tiny single-task stage per query, never a
  *    corpus-sized sort. The corpus-scale work stays in the retrieval
  *    stages (pruned posting scans, bucketed ANN probes) that PRODUCE the
  *    lists.
  *  - [[collapseTop]] and [[functionScore]] operate on a full match set
  *    and stay fully distributed: collapse is one hash-partitioned window
  *    by the collapse key; functionScore is one key join against the
  *    (column-pruned) attribute table.
  */
object Fusion {

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009): each input list
    * is ranked by (`scoreCol` desc, `idCol` asc), and a document's fused
    * score is Σ_lists 1/(rrfK + rank). Documents appearing in only some
    * lists receive contributions only from those lists — the standard
    * hybrid-search semantics (lexical top-k fused with embedding top-k).
    *
    * Determinism contract: pass INTEGER score columns (the engine's
    * micro-unit longs) so ranks — and therefore the fused f64 sum of
    * exactly-representable reciprocals — are identical across engines;
    * ranks beyond `maxRank` are dropped (a list longer than the retrieval
    * cut contributes nothing past it, matching the "fuse the top-k lists"
    * definition).
    *
    * Output: (`idCol`, rrf) sorted (rrf desc, id asc), cut to `topK` when
    * `topK > 0`.
    */
  def rrf(lists: Seq[DataFrame], idCol: String, scoreCol: String,
      rrfK: Int = 60, maxRank: Int = 100, topK: Int = -1): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(rrfK >= 1 && maxRank >= 1, "rrfK and maxRank must be positive")
    val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
    val ranked = lists.map { df =>
      df.select(col(idCol), col(scoreCol))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= maxRank)
        .select(col(idCol), (lit(1.0) / (lit(rrfK) + col("rank"))).as("contrib"))
    }
    val fused = ranked.reduce(_ unionByName _)
      .groupBy(col(idCol)).agg(sum(col("contrib")).as("rrf"))
    val sorted = fused.orderBy(col("rrf").desc, col(idCol).asc)
    if (topK > 0) sorted.limit(topK) else sorted
  }

  /** Field collapsing (one result per group — "best hit per repo"): keep
    * the top `perGroup` rows of each `groupCol` value by (`scoreCol` desc,
    * `idCol` asc). `results` is a scored match set (any retrieval stage's
    * output); `attrs` carries (`idCol`, `groupCol`) — the corpus table,
    * column-pruned by Catalyst to exactly those two columns at the scan.
    *
    * One equi-join (match set × pruned attribute projection) and one
    * window HASH-PARTITIONED by the collapse key — both scale out; no
    * global sort until the caller's final top-k cut.
    */
  def collapseTop(results: DataFrame, attrs: DataFrame, idCol: String,
      groupCol: String, scoreCol: String, perGroup: Int = 1): DataFrame = {
    require(perGroup >= 1, "perGroup must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    results.join(attrs.select(col(idCol), col(groupCol)), idCol)
      .withColumn("rank_in_group", row_number().over(w))
      .filter(col("rank_in_group") <= perGroup)
      .drop("rank_in_group")
  }

  /** Multiplicative score modifier (`function_score`): final score =
    * `scoreCol` × `factor`, where `factor` is any deterministic Column
    * expression over the attribute table's columns (recency decay, field
    * weight, quality prior). One key join against the column-pruned
    * attribute projection; the factor stays inside whole-stage codegen.
    */
  def functionScore(results: DataFrame, attrs: DataFrame, idCol: String,
      factorCols: Seq[String], scoreCol: String, factor: Column): DataFrame =
    results.join(attrs.select((idCol +: factorCols).map(col): _*), idCol)
      .withColumn(scoreCol, col(scoreCol) * factor)
      .drop(factorCols: _*)
}
