package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.pipeline.Similarity

/** SQL registration of the native expressions: `spark.sql` must reach the
  * same codegen'd operators (same values as the Column API).
  */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_dot / graft_sign_lsh / graft_md5_halves work from spark.sql") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")

    val viaSql = spark.sql(
      """SELECT vec_id,
        |  graft_dot(embedding, embedding) AS d,
        |  graft_sign_lsh(embedding, 64, 8) AS b,
        |  graft_md5_halves(CAST(vec_id AS STRING)).h1 AS h1
        |FROM emb_sql ORDER BY vec_id""".stripMargin).collect()
    val viaApi = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("d"),
        Similarity.signLshBucket(col("embedding"), 64, 8).as("b"),
        graft.functions.Md5Halves.halvesCol(col("vec_id").cast("string"))
          .getField("h1").as("h1"))
      .orderBy("vec_id").collect()
    assert(viaSql.length == viaApi.length && viaSql.length > 0)
    viaSql.zip(viaApi).foreach { case (a, b) =>
      assert(a.getDouble(1) == b.getDouble(1))
      assert(a.getInt(2) == b.getInt(2))
      assert(a.getLong(3) == b.getLong(3))
    }
    // non-literal dim must fail loudly, not silently mis-bucket
    intercept[Exception] {
      spark.sql("SELECT graft_sign_lsh(embedding, vec_id + 1, 8) FROM emb_sql").collect()
    }
  }
}
