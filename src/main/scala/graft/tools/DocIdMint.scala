package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Doc-key minting: the reference index key is a generic opaque `T`
  * (/root/reference/src/index.rs:35); our tables use a Long `doc_id`. The
  * north-star input is keyed by (repo, path, commit) — this helper mints a
  * unique Long per natural key and keeps the key↔id mapping AS A TABLE so
  * ids can be resolved back without ever collecting them.
  *
  * Why not a hash of the key: at 10^12 rows a 64-bit hash has a ~10^-4
  * birthday-collision-free probability — guaranteed-unique ids need
  * assignment, not hashing. Why `monotonically_increasing_id` and not
  * `row_number() over ()`: the window would force a single-partition total
  * sort of the whole corpus; m_i_id is narrow (partition-prefixed counter,
  * no shuffle). The ids are NOT stable across recomputations — stability
  * comes from persisting the minted table / the [[mapping]] once and
  * joining it back ([[remint]]).
  */
object DocIdMint {

  /** Append a minted unique `doc_id` column. Mint ONCE and persist; the
    * assignment is not stable across recomputations of a lazy plan, so
    * write the result (or at least [[mapping]]) before fanning out.
    */
  def mint(df: DataFrame): DataFrame =
    df.withColumn("doc_id", monotonically_increasing_id())

  /** Mint ids in a chosen GLOBAL order — the impact-ordering lever:
    * sorting the corpus by a score-correlated key (source tier, quality
    * score, recency) before minting makes doc-id ranges score-clustered,
    * which is precisely the property that lets block-max WAND prune
    * (measured: 391→40 surviving ranges and a 5.7× hot-term win on a
    * range-clustered corpus vs ZERO pruning on a uniform one — BENCH.md
    * round-3 cluster experiment). `monotonically_increasing_id` after a
    * range-partitioned sort preserves the global order across partitions
    * (partition-prefixed counters: ids are ordered, not contiguous).
    */
  def mintOrdered(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    mint(df.orderBy(orderCols: _*))

  /** The (natural key → doc_id) mapping table of a minted DataFrame. */
  def mapping(minted: DataFrame, keyCols: Seq[String]): DataFrame =
    minted.select((keyCols :+ "doc_id").map(col): _*)

  /** Resolve doc_ids back to natural keys (e.g. to report query results as
    * (repo, path, commit)): a broadcast-or-shuffle join on doc_id, never a
    * driver round-trip.
    */
  def resolve(ids: DataFrame, mapping: DataFrame): DataFrame =
    ids.join(mapping, Seq("doc_id"))

  /** Re-attach previously minted ids to a fresh read of the source table,
    * minting NEW ids only for keys absent from the mapping (incremental
    * ingest). New ids start above max(existing)+1, so they never collide
    * with minted history; the one tiny driver action is the max() scalar.
    */
  def remint(df: DataFrame, mapping: DataFrame, keyCols: Seq[String]): DataFrame = {
    val known = mapping.withColumnRenamed("doc_id", "_known_id")
    val joined = df.join(known, keyCols, "left")
    val base = mapping.agg(coalesce(max(col("doc_id")), lit(-1L)))
      .head().getLong(0) + 1L
    joined.withColumn("doc_id",
      coalesce(col("_known_id"), monotonically_increasing_id() + lit(base)))
      .drop("_known_id")
  }
}
