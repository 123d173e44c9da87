package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

/** The fused native dot product must be BIT-identical to the composed
  * `aggregate(zip_with(...))` form — values (same accumulation order) and
  * null semantics (null array, unequal lengths, null elements).
  */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("fused dot == composed dot, bit-identical, incl. null semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Seq[Option[Float]], Seq[Option[Float]])] =
      Seq.tabulate(200) { i =>
        val n = 1 + rnd.nextInt(96)
        val m = if (i % 17 == 0) n + 1 else n // some unequal lengths
        def vec(k: Int) = Seq.tabulate(k)(j =>
          if (i % 23 == 0 && j == k / 2) None // some null elements
          else Some(rnd.nextFloat() * 2f - 1f))
        (vec(n), vec(m))
      } :+ ((null, Seq(Some(1f)))) // null array

    val df = rows.toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
      .select(Similarity.dot(col("a"), col("b")).as("fused"),
        Similarity.dotComposed(col("a"), col("b")).as("composed"))
    val got = df.collect()
    got.zipWithIndex.foreach { case (r, i) =>
      val f = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val c = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(f == c, s"row $i: fused=$f composed=$c")
    }
    assert(got.exists(_.isNullAt(0)) && got.exists(!_.isNullAt(0)))
  }

  test("fused dot stays inside whole-stage codegen") {
    // a real file scan (a local relation would be constant-folded away)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = e.select(Similarity.dot(col("embedding"), col("embedding")).as("d"))
    // `*(1)` is the compact toString marker for a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("dotproductff"), plan)
    // d = ‖v‖² > 0 for every non-zero embedding
    assert(df.filter(col("d") > 0).count() == e.count())
  }
}
