package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash/tokenize helpers shared by the data-pipeline operators.
  *
  * The hash family is built on md5 so that every operator here is
  * reproducible OUTSIDE Spark with identical values (the driver's DuckDB
  * oracle computes the same `hex→int64` on its side). Spark's native
  * `xxhash64` would be faster but engine-specific; these operators take the
  * hash as a pluggable Column function where it matters.
  */
object Portable {

  /** First 60 bits of md5(s) as a non-negative long (15 hex chars).
    * Portable: `CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)` in DuckDB,
    * `conv(substring(md5(s),1,15),16,10)` here.
    */
  def md5Long(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Two independent 56-bit halves of ONE md5 digest — the seeds of the
    * Carter–Wegman minhash family `h_j = h1 + j·h2` ([[md5FamilyMember]]).
    * One digest per value instead of one per (value, j): at corpus scale
    * the digest IS the minhash cost, so a k-hash signature gets k× cheaper.
    * 56-bit halves keep `h1 + j·h2` inside int64 for j ≤ 63.
    * DuckDB mirror: `CAST(('0x' || substr(md5(s), 1, 14)) AS BIGINT)` and
    * `substr(md5(s), 15, 14)`.
    */
  def md5Halves(hex: Column): (Column, Column) =
    (conv(substring(hex, 1, 14), 16, 10).cast("long"),
      conv(substring(hex, 15, 14), 16, 10).cast("long"))

  /** Member j of the 2-universal family seeded by [[md5Halves]]. */
  def md5FamilyMember(h1: Column, h2: Column, j: Int): Column =
    h1 + lit(j.toLong) * h2

  /** Whitespace tokens (engine tokenizer semantics: single-space split,
    * empties dropped).
    */
  def tokens(text: Column): Column = graft.analysis.Analyzer.tokensCol(text)

  /** Floor a DataFrame's partition count at the cluster's default
    * parallelism — the guard EVERY CPU-heavy / high-fan-out per-row stage
    * here sits behind. A parquet file under `maxPartitionBytes` with one
    * row group is ONE scan split no config can subdivide, so a shingle
    * explode (×tokens/doc) or a pixel decode downstream of it runs in a
    * single task while the rest of the cluster idles (guide §2.5 input
    * skew / §6.1 scan parallelism; measured: the sf0.1 snippet pass is one
    * 2 s task without this). The round-robin repartition moves only the
    * RAW rows (pre-fan-out bytes) and is deterministic under retries
    * (sort-before-repartition, SPARK-23207). SCALE-ADAPTIVE: a corpus
    * whose scan already has ≥ parallelism splits — any real 100-TB input —
    * passes through untouched, so this never inserts a corpus-wide
    * shuffle where the layout is already parallel.
    */
  def parallelized(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** k-token shingles over an ALREADY-MATERIALIZED token array column.
    *
    * The token array must be a bound attribute, not the tokenize
    * expression itself: higher-order functions are evaluated outside
    * whole-stage codegen with no subexpression elimination, so an
    * `element_at(split(...), i)` inside the lambda re-splits the full text
    * once per element per window offset — O(tokens·k) full-text splits per
    * document (measured 3.5× on the sf0.1 minhash query). Callers project
    * [[tokens]] into a column first (see [[Dedup.docShingles]]); Catalyst's
    * CollapseProject keeps the multi-use non-cheap alias materialized.
    * Docs with fewer than k tokens produce no shingles.
    */
  def shinglesOfTokens(t: Column, k: Int): Column =
    when(size(t) >= k,
      transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", (0 until k).map(o => element_at(t, i + o + 1)): _*))
    ).otherwise(array())
}
