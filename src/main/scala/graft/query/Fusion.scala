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

  /** Hard cap on [[rescore]]'s first-phase window: bounds the one driver
    * collect (≤ cap × ~24 B ≈ 1.6 MB) and the InSet predicate size.
    * Elasticsearch's equivalent knob (`index.max_rescore_window`)
    * defaults to 10,000.
    */
  val MaxRescoreWindow = 65536

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
      // ENFORCE the top-k-lists input contract instead of documenting it:
      // each list is cut to maxRank by (score desc, id asc) — a
      // TakeOrderedAndProject, distributed — BEFORE the unpartitioned
      // rank window, so the single-task window sees ≤ maxRank rows even
      // when a caller passes a full match set (ranks are identical: the
      // cut keeps exactly the rows whose rank would be ≤ maxRank under
      // the same total order; the post-window filter stays as a guard).
      df.select(col(idCol), col(scoreCol))
        .orderBy(col(scoreCol).desc, col(idCol).asc).limit(maxRank)
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

  /** Two-phase rescoring (`rescore`): cut the match set to the top
    * `windowSize` docs by (`scoreCol` desc, `idCol` asc) — a cheap
    * first-phase ranking — then blend in a more expensive secondary
    * signal over ONLY that window:
    * `blended = queryWeight·score + rescoreWeight·secondary`
    * (docs absent from `secondary` contribute 0 from it). Output is the
    * rescored window ordered (blended desc, id asc), cut to `topK` when
    * `topK > 0`.
    *
    * Scale shape: the window cut is one `TakeOrderedAndProject` over the
    * first-phase match set (already pruned by the retrieval stage),
    * collected once under [[MaxRescoreWindow]]; the window ids reach the
    * secondary's (column-pruned) parquet scan as a pushed-down InSet
    * predicate, so the expensive signal (embedding cosine, a model
    * score) is evaluated on k·10² docs, never the corpus.
    *
    * Determinism contract: pass INTEGER micro-unit score columns and
    * integer-valued weights and the blend is exact long arithmetic,
    * rank-identical across engines.
    */
  def rescore(results: DataFrame, idCol: String, scoreCol: String,
      secondary: DataFrame, secondaryCol: String, windowSize: Int,
      queryWeight: Column = lit(1L), rescoreWeight: Column = lit(1L),
      topK: Int = -1): DataFrame = {
    require(windowSize >= 1 && windowSize <= MaxRescoreWindow,
      s"windowSize must be in [1, $MaxRescoreWindow] — a rescore window is" +
        " a driver-bounded top cut by definition (cf. Elasticsearch's" +
        " index.max_rescore_window); for corpus-wide blending use rrf or" +
        " functionScore")
    // The window is collected ONCE (≤ windowSize (id, score) rows — the
    // same capped-collect idiom as the WAND survivor set): an outer join
    // can only broadcast its NON-preserved side, so any plan that keeps
    // `window` as a lazy subplan either broadcasts the corpus-sized
    // secondary or evaluates the first-phase retrieval twice. Collecting
    // gives (a) exactly one phase-1 evaluation, and (b) the window ids as
    // an InSet predicate pushed into the secondary's parquet scan
    // (row-group pruning) instead of a streamed semi-join probe.
    val spark = results.sparkSession
    val winPlan = results.select(col(idCol), col(scoreCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc).limit(windowSize)
    val winRows = winPlan.collect()
    val window = spark.createDataFrame(
      spark.sparkContext.parallelize(winRows.toIndexedSeq, 1), winPlan.schema)
    val ids = winRows.map(_.get(0)).toIndexedSeq
    // secondary col aliased so scoreCol == secondaryCol can't collide
    val secW = secondary
      .select(col(idCol), col(secondaryCol).as("_rescore_sec"))
      .filter(col(idCol).isInCollection(ids))
    val blended = window.join(broadcast(secW), Seq(idCol), "left")
      .select(col(idCol),
        (queryWeight * col(scoreCol) +
          rescoreWeight * coalesce(col("_rescore_sec"),
            lit(0L).cast(secondary.schema(secondaryCol).dataType)))
          .as("blended"))
    val sorted = blended.orderBy(col("blended").desc, col(idCol).asc)
    if (topK > 0) sorted.limit(topK) else sorted
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
