package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** IVF coarse-quantizer ANN ([[graft.pipeline.Similarity.ivfCosineTopK]]):
  * deterministic sampled centroids, codegen'd argmax assignment, nested
  * probe sets, and exact parity with brute force at full probe.
  */
class IvfSpec extends TestBase {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("centroid sample is deterministic, dense and nCells-sized") {
    val a = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    val b = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    assert(a.length == 16)
    assert(a.map(_._1).toSeq == (0 until 16))
    assert(a.map(_._2.toSeq) sameElements b.map(_._2.toSeq))
  }

  test("every vector gets exactly one in-range cell") {
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    val asg = emb.select(col("vec_id"),
      Similarity.ivfCellCol(col("embedding"), cents).as("cell"))
    val n = emb.count()
    assert(asg.count() == n)
    assert(asg.filter(col("cell") < 0 || col("cell") >= 16).count() == 0)
    // the assignment is a function of the vector: re-evaluation agrees
    val again = emb.select(col("vec_id"),
      Similarity.ivfCellCol(col("embedding"), cents).as("cell2"))
    assert(asg.join(again, "vec_id")
      .filter(col("cell") =!= col("cell2")).count() == 0)
  }

  test("nProbe = nCells degenerates to exact brute-force top-k") {
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = Similarity.ivfCosineTopK(emb, "vec_id", "embedding", 8, 8, q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == exact)
  }

  test("probe sets are nested in nProbe (recall monotone by construction)") {
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0)
    val c2 = Similarity.ivfProbeCandidates(emb, "vec_id", "embedding", 16, 2, q)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val c4 = Similarity.ivfProbeCandidates(emb, "vec_id", "embedding", 16, 4, q)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(c2.nonEmpty && c2.subsetOf(c4))
    // the query's own nearest cell is probed first, so the query vector
    // itself (vec_id 7 is in the corpus) is always a candidate
    assert(c2.contains(7L))
  }

  test("clustered vectors: probing 1/8 of cells finds most of the true top-k") {
    val ds = graft.tools.VectorFixtures
      .clustered(spark, 1600, 64, 40, 0.25, 11L).cache()
    try {
      val q = ds.filter(col("vec_id") === 3).select("embedding")
        .head().getSeq[Float](0)
      val truth = Similarity.cosineTopK(ds, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val got = Similarity.ivfCosineTopK(ds, "vec_id", "embedding", 16, 2, q, 10)
        .collect().map(_.getLong(0)).toSet
      val recall = (truth & got).size.toDouble / truth.size
      assert(recall >= 0.5,
        s"IVF recall@10 with 2/16 cells on clustered vectors too low: $recall")
    } finally { ds.unpersist(); () }
  }
}
