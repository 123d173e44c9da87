package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic embedding fixtures for ANN recall evidence.
  *
  * The round-4 recall curve ran on WORST-CASE uniform random vectors
  * (no neighborhood structure — sign-LSH recall there is essentially the
  * fraction of the corpus probed, up to a ~2× projection correlation).
  * Real embedding spaces are CLUSTERED: a query's true top-k live in its
  * own cluster, which the hyperplane hash preserves far better. The
  * Gaussian-mixture fixture makes that measurable and reproducible
  * (seeded, no environment dependence).
  */
object VectorFixtures {

  /** `n` vectors of `centers` Gaussian clusters in `dim` dims: vector i =
    * center(i % centers) + noise · N(0,1). Fully deterministic in `seed`.
    * `centers = n` with any noise degenerates to pure N(0,1) vectors —
    * the uniform (structureless) control.
    */
  def clustered(spark: SparkSession, n: Int, dim: Int, centers: Int,
      noise: Double, seed: Long): DataFrame = {
    import spark.implicits._
    val rc = new scala.util.Random(seed)
    val cs = Array.fill(centers, dim)(rc.nextGaussian())
    val rows = (0 until n).map { i =>
      val r = new scala.util.Random(seed * 1000003L + i)
      val c = cs(i % centers)
      (i.toLong,
        Array.tabulate(dim)(d => (c(d) + noise * r.nextGaussian()).toFloat).toSeq)
    }
    // parallelized from the driver: n·dim floats (≤ tens of MB at probe
    // scale) — the fixture is a measurement instrument, not a data path
    rows.toDF("vec_id", "embedding").repartition(32)
  }

  def uniform(spark: SparkSession, n: Int, dim: Int, seed: Long): DataFrame =
    clustered(spark, n, dim, centers = n, noise = 0.0, seed = seed)
}
