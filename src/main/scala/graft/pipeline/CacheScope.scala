package graft.pipeline

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Owner of the `persist(MEMORY_AND_DISK)` cut points the pipeline
  * operators ([[Dedup]], [[Similarity]]) create for DataFrames that feed
  * both sides of a self-join or ≥2 downstream aggregations.
  *
  * The operators return LAZY DataFrames, so they cannot unpersist their
  * intermediates themselves — the caches must outlive the call and be
  * released only after the result is consumed. This handle makes that
  * ownership explicit instead of leaking pinned storage into the
  * SparkContext for the driver's lifetime:
  *
  * {{{
  *   CacheScope.withScope { scope =>
  *     Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.1, scope = scope)
  *       .write.parquet(out)        // consume INSIDE the scope
  *   }                              // intermediates unpersisted here
  * }}}
  *
  * Operators called without an explicit scope persist into
  * [[CacheScope.global]] (the old behavior, but now releasable in one call
  * — [[CacheScope.releaseGlobal]] — instead of only via
  * `spark.catalog.clearCache()`, which would also evict unrelated caches
  * like a live index).
  */
final class CacheScope extends AutoCloseable {
  private val handles = ArrayBuffer.empty[DataFrame]

  /** Persist `df` at MEMORY_AND_DISK and track it for release. */
  private[graft] def cut(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    handles += p
    p
  }

  /** Unpersist every tracked intermediate. Safe to call more than once;
    * the scope is reusable afterwards.
    */
  override def close(): Unit = synchronized {
    handles.foreach(_.unpersist(false))
    handles.clear()
  }
}

object CacheScope {

  /** Default owner for operators called without an explicit scope. A
    * long-lived driver composing pipeline operators should either pass its
    * own scope or call [[releaseGlobal]] between batches.
    */
  val global: CacheScope = new CacheScope

  def releaseGlobal(): Unit = global.close()

  /** Run `f` with a fresh scope and release its caches on exit. The result
    * must be CONSUMED (collected/written) inside `f` — a lazy DataFrame
    * escaping the scope recomputes its intermediates on next use.
    */
  def withScope[A](f: CacheScope => A): A = {
    val s = new CacheScope
    try f(s) finally s.close()
  }
}
