package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Broadcast-sized global field statistics (reference `FieldDetails`,
  * /root/reference/src/index.rs:389-396 — per-field `sum` of token counts
  * and `avg = sum / N`, plus the live document count N which the reference
  * keeps as `docs.len()`).
  *
  * The reference maintains these incrementally on add/remove
  * (/root/reference/src/index.rs:112-113, 175-183); steady-state they equal
  * a recomputation over live docs, which is what we do (one tiny agg,
  * collected to the driver and folded into score expressions as literals).
  */
final case class FieldStats(n: Long, sums: Array[Long], avgs: Array[Double])

/** Immutable handle on the index tables. This is the Spark-native
  * re-expression of the reference `Index<T>` struct
  * (/root/reference/src/index.rs:19-33): the char-trie + intrusive posting
  * lists become three relational tables, and the `removed` tombstone set a
  * fourth.
  *
  *  - `postings(term, doc_id, tf: array<int>, fl: array<int>, occ: int)` —
  *    one row per DISTINCT (term, doc); `tf(x)` is the term frequency in
  *    field x (reference `DocumentPointer.term_frequency`), `occ = Σx tf(x)`
  *    is the number of posting pointers the reference would hold (it stores
  *    one pointer per token OCCURRENCE, /root/reference/src/index.rs:119-157),
  *    and `fl` is the owning doc's per-field token count, denormalized here
  *    so scoring needs no docstats join at query time.
  *  - `docstats(doc_id, fl: array<int>)` — reference `DocumentDetails`.
  *  - `termdict(term, df: long)` — df is the OCCURRENCE count Σ_docs occ,
  *    matching reference `count_documents` which counts pointers, not
  *    distinct docs (/root/reference/src/index.rs:281-297; pinned by
  *    /root/reference/tests/document_frequency.rs).
  *  - `tombstones(doc_id)` — lazy-deleted docs awaiting [[Mutations.vacuum]]
  *    (reference `removed`, /root/reference/src/index.rs:27-32).
  */
final case class InvertedIndex(
    postings: DataFrame,
    docstats: DataFrame,
    termdict: DataFrame,
    tombstones: DataFrame,
    numFields: Int,
    /** Cheap driver-side knowledge that no doc was ever removed; lets the
      * query path skip the anti-join entirely (common case at scale).
      */
    hasTombstones: Boolean,
    /** Precomputed stats (persisted index): avoids the docstats scan per
      * query. Only trusted while no tombstones exist.
      */
    statsHint: Option[FieldStats] = None
) {

  /** Live docstats (tombstoned docs excluded). */
  def liveDocstats: DataFrame =
    if (hasTombstones) docstats.join(tombstones, Seq("doc_id"), "left_anti")
    else docstats

  /** Live postings (tombstoned docs excluded). */
  def livePostings: DataFrame =
    if (hasTombstones) postings.join(tombstones, Seq("doc_id"), "left_anti")
    else postings

  /** Compute global stats over live docs. Reference semantics: N counts ALL
    * live docs (even those with an empty field), per-field sum counts
    * non-empty tokens, avg = sum / N (/root/reference/src/index.rs:112-113).
    * One tiny aggregate job; result is broadcast into score expressions as
    * literals.
    */
  def fieldStats(): FieldStats = {
    if (!hasTombstones && statsHint.isDefined) return statsHint.get
    val aggs = count(lit(1)).as("n") +:
      (0 until numFields).map(i =>
        coalesce(sum(element_at(col("fl"), i + 1)), lit(0L)).as(s"s$i"))
    val row = liveDocstats.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    val sums = (0 until numFields).map(i => row.getLong(i + 1)).toArray
    FieldStats(n, sums, sums.map(_.toDouble / n.toDouble))
  }

  /** Persist the index tables in memory (build once, query many). */
  def cached(): InvertedIndex =
    copy(postings = postings.cache(), docstats = docstats.cache(),
      termdict = termdict.cache(),
      tombstones = if (hasTombstones) tombstones.cache() else tombstones)

  def unpersist(): Unit = {
    postings.unpersist(); docstats.unpersist(); termdict.unpersist()
    if (hasTombstones) tombstones.unpersist()
    ()
  }
}

object InvertedIndex {
  def emptyTombstones(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType, nullable = false))))
  }
}
