package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: fill fixed token-budget
  * context windows with whole documents, greedily, in a deterministic
  * order — the step between a cleaned corpus and a training shard.
  *
  * Semantics (first-fit in id order, per shard): walk the shard's docs by
  * ascending id keeping a running fill; a doc that would overflow the
  * budget closes the pack and opens the next one. A doc LARGER than the
  * budget still gets placed (its own pack overflows past the budget) —
  * packing never drops or splits data here; splitting is the tokenizer's
  * job downstream, and an explicit `oversize` flag marks those rows.
  *
  * Scale shape: packing is inherently SEQUENTIAL within a pack stream, so
  * the shard key IS the parallelism unit — exactly how production
  * pipelines shard training files. One shuffle (`groupByKey(shard)` with
  * the sort pushed into the shuffle via `flatMapSortedGroups` — no
  * driver-side anything), then a streaming O(1)-state fold per shard:
  * memory is independent of shard size, so a shard of 10^9 docs streams.
  * Skewed/huge shards: split them DETERMINISTICALLY first with
  * [[saltedShard]] (a pure function of the id, so the output is still
  * reproducible); at 100 TB pick `parts` so each sub-shard is a few GB —
  * the packing stage then scales out to any executor count.
  *
  * Determinism: output is a pure function of (id, shard, token count,
  * budget) — re-runs, backfills, and external audits (the q52 DuckDB
  * oracle recomputes the same greedy walk as a recursive CTE) produce
  * byte-identical pack assignments, the property a reproducible training
  * run needs.
  */
object Packing {

  // NOT private: Spark's generated row deserializer instantiates this
  // from outside the object, so the constructor must be accessible.
  case class PackDoc(shard: String, doc_id: Long, n_tokens: Int)

  /** Deterministic sub-shard key for bounding shard size: appends
    * `'#' || (md5-draw(id) mod parts)` to the shard. A pure function of
    * (shard, id, parts) — NOT round-robin or RNG — so packing stays
    * reproducible across runs and engines.
    */
  def saltedShard(shard: Column, id: Column, parts: Int): Column =
    concat(shard, lit("#"),
      pmod(Portable.md5Long(id.cast("string")), lit(parts.toLong)))

  /** Greedy first-fit packing of `docs` into `budget`-token packs, one
    * pack stream per `shard`. Output: one row per doc —
    * `(shard, doc_id, n_tokens, pack_id, pack_pos, oversize)` where
    * `pack_id` counts packs within the shard from 0 and `pack_pos`
    * positions the doc within its pack from 1. Token counts are engine
    * whitespace-tokenizer counts ([[Portable.tokens]] — the same counts
    * [[TextStats.tokenCounts]] reports as `ws_tokens`).
    */
  def packGreedy(docs: DataFrame, id: String, text: String, shard: String,
      budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(shard).cast("string").as("shard"),
        col(id).cast("long").as("doc_id"),
        size(Portable.tokens(col(text))).as("n_tokens"))
      .as[PackDoc]
      .groupByKey(_.shard)
      .flatMapSortedGroups(col("doc_id")) { (sh: String, it: Iterator[PackDoc]) =>
        var pack = 0L
        var fill = 0L
        var pos = 0L
        it.map { d =>
          if (fill > 0 && fill + d.n_tokens > budget) {
            pack += 1; fill = 0L; pos = 0L
          }
          fill += d.n_tokens
          pos += 1
          (sh, d.doc_id, d.n_tokens, pack, pos, d.n_tokens > budget)
        }
      }
      .toDF("shard", "doc_id", "n_tokens", "pack_id", "pack_pos", "oversize")
  }

  /** Per-pack utilization summary over [[packGreedy]] output:
    * `(shard, pack_id, docs, fill, utilization)` — the number a mixing
    * run monitors (padding waste = 1 − mean utilization). Oversize packs
    * report utilization 1.0 (they carry no padding).
    */
  def packStats(packed: DataFrame, budget: Int): DataFrame =
    packed.groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("docs"), sum("n_tokens").as("fill"))
      .withColumn("utilization",
        least(lit(1.0), col("fill").cast("double") / lit(budget.toDouble)))
}
