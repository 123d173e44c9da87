package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data mixing.
  *
  * `spark.sampleBy` draws from a seeded RNG whose stream depends on
  * partitioning and evaluation order — re-running the pipeline (or
  * auditing it from another engine) cannot reproduce the sample. Data
  * mixing for a training run needs the OPPOSITE: the kept set must be a
  * pure function of (row id, stratum, configured rate), so a re-run, a
  * backfill, and the external audit all select byte-identical rows.
  *
  * Draw: the first 60 bits of `md5(salt ':' id)` as a uniform integer in
  * `[0, 2^60)` ([[Portable.md5Long]] — the same portable hash family every
  * pipeline operator here uses); a row is kept iff `draw < rate · 2^60`.
  * Thresholding gives NESTED samples for free: the 30% sample is a strict
  * subset of the 60% sample of the same (salt, stratum), which is how
  * mixture weights get re-tuned without reshuffling data.
  *
  * Scale shape: a pure map-side filter — no shuffle, no state, codegen'd
  * end to end; the rate table is config-sized (a literal CASE), never a
  * join. At 100 TB this is the cheapest possible operator shape.
  */
object Sampling {

  /** Draw space: 60 bits (15 hex chars of the digest — stays positive in
    * an int64 and mirrors to DuckDB as
    * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`).
    */
  val DrawSpace: Long = 1L << 60

  /** `floor(rate · 2^60)` clamped to [0, 2^60]: rate 0 keeps nothing,
    * rate 1 everything (draws are strictly below 2^60).
    */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    math.min(DrawSpace, (rate * DrawSpace.toDouble).toLong)
  }

  /** The uniform draw column for a row id (exposed so oracles/tests and
    * the SQL mirror stay definitionally tied to one place).
    */
  def drawCol(id: Column, salt: String): Column =
    Portable.md5Long(concat(lit(salt), lit(":"), id.cast("string")))

  /** Keep each row iff `draw(id) < rate(stratum) · 2^60`; strata absent
    * from `rates` use `defaultRate`. All input columns pass through.
    */
  def stratifiedSample(df: DataFrame, id: String, strata: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "mix"): DataFrame = {
    val thr = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (k, r)) => when(col(strata) === lit(k), lit(threshold(r))).otherwise(acc)
    }
    df.filter(drawCol(col(id), salt) < thr)
  }
}
