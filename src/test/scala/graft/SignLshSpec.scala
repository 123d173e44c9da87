package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

/** The fused sign-LSH bucket must be BIT-identical to the composed
  * md5-derived formulation on real fixed-width vectors (which is what the
  * DuckDB oracles compute).
  */
class SignLshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("fused buckets == composed buckets on the embeddings corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val both = e.select(
      Similarity.signLshBucket(col("embedding"), 64, 8).as("fused"),
      Similarity.signLshBucketComposed(col("embedding"), 64, 8).as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() == 0)
    val distinct = both.select("fused").distinct().count()
    assert(distinct > 1, "degenerate bucketing") // buckets actually spread
  }

  test("fused bucket stays inside whole-stage codegen") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = e.select(Similarity.signLshBucket(col("embedding"), 64, 8).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("signlsh"), plan)
  }

  test("fused == composed on DIRTY inputs: null vec/element, short, long, NaN") {
    import spark.implicits._
    val dim = 4; val nBits = 3
    def full = Seq.tabulate(dim)(i => Some(0.1f * (i + 1)))
    val rows: Seq[Seq[Option[Float]]] = Seq(
      null, // null vector → composed bucket 0
      full, // clean
      full.take(dim - 1), // shorter → null-padding poisons → 0
      full ++ Seq(Some(9f), Some(-3f)), // longer → surplus folds with sign −1
      full.updated(1, None), // null element → 0
      full.updated(2, Some(Float.NaN)) // NaN → NaN proj → bit SET (NaN > 0)
    )
    val df = rows.map(Tuple1(_)).toDF("v")
      .select(col("v").cast("array<float>").as("v"))
      // repartition defeats local-relation constant folding so the fused
      // side actually runs its generated code
      .repartition(2)
      .select(
        Similarity.signLshBucket(col("v"), dim, nBits).as("fused"),
        Similarity.signLshBucketComposed(col("v"), dim, nBits).as("composed"))
      .collect()
    df.zipWithIndex.foreach { case (r, i) =>
      val c = if (r.isNullAt(1)) 0 else r.getInt(1) // composed never nulls
      assert(!r.isNullAt(0) && r.getInt(0) == c,
        s"row $i: fused=${r.get(0)} composed=${r.get(1)}")
    }
  }
}
