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

  test("fused bucket stays inside whole-stage codegen; null vector is null") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = e.select(Similarity.signLshBucket(col("embedding"), 64, 8).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("signlsh"), plan)
    import spark.implicits._
    val nul = Seq(Tuple1(null.asInstanceOf[Seq[Float]])).toDF("v")
      .select(col("v").cast("array<float>").as("v"))
      .select(Similarity.signLshBucket(col("v"), 64, 8))
    assert(nul.head().isNullAt(0))
    // strict width: a wrong-size vector surfaces as null, never as a
    // silently-different bucket
    val short = Seq(Tuple1(Seq(1f, 2f, 3f))).toDF("v")
      .select(col("v").cast("array<float>").as("v"))
      .select(Similarity.signLshBucket(col("v"), 64, 8))
    assert(short.head().isNullAt(0))
  }
}
