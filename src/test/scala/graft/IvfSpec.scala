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

  test("native NearestCentroid is bit-identical to the composed argmax, incl. dirty inputs") {
    import spark.implicits._
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    // clean corpus: every assignment agrees
    val diff = emb.select(
        Similarity.ivfCellCol(col("embedding"), cents).as("native"),
        Similarity.ivfCellColComposed(col("embedding"), cents).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(diff == 0)
    // dirty inputs: null vector, null element, wrong length — parity must
    // hold on every one. (A ZERO vector is the documented divergence: the
    // composed form throws DIVIDE_BY_ZERO under ANSI mode, the native form
    // keeps IEEE semantics — all cosines NaN, NaN sorts greatest, tie →
    // cell 0 — i.e. strictly more tolerant; asserted separately below.)
    val dim = cents.head._2.length
    val dirty = Seq[(Long, Option[Seq[Option[Float]]])](
      (1L, None),
      (2L, Some(Seq.fill(dim)(Option(1.0f)).updated(3, None))),
      (3L, Some(Seq.fill(dim - 2)(Option(0.5f)))),
      (4L, Some(Seq.fill(dim + 3)(Option(0.5f)))),
      (6L, Some(Seq.tabulate(dim)(i => Option(i.toFloat - 3f)))))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val dirtyDiff = dirty.select(
        Similarity.ivfCellCol(col("embedding"), cents).as("native"),
        Similarity.ivfCellColComposed(col("embedding"), cents).as("composed"))
      .filter(not(col("native") <=> col("composed"))).count()
    assert(dirtyDiff == 0)
    val zeroVec = Seq(Tuple1(Seq.fill(dim)(0.0f))).toDF("embedding")
      .select(col("embedding").cast("array<float>").as("embedding"))
    assert(zeroVec.select(Similarity.ivfCellCol(col("embedding"), cents))
      .head().getInt(0) == 0)
    // SQL surface: graft_nearest_centroid over a foldable literal matrix
    graft.functions.GraftFunctions.register(spark)
    emb.limit(50).createOrReplaceTempView("ivf_sql_emb")
    val lits = cents.map(_._2.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val viaSql = spark.sql(
      s"SELECT vec_id, graft_nearest_centroid(embedding, $lits) AS cell FROM ivf_sql_emb")
    val viaCol = emb.limit(50).select(col("vec_id"),
      Similarity.ivfCellCol(col("embedding"), cents).as("cell"))
    assert(viaSql.exceptAll(viaCol).count() == 0)
  }

  test("a zero-norm centroid ranks GREATEST in probe order (assignment parity)") {
    import spark.implicits._
    // cell 1 is a zero vector: every corpus vector's cosine vs it is NaN,
    // and NearestCentroid's NaN-greatest rule assigns EVERYTHING to it.
    // Probe ranking must agree — Scala's default Double ordering sorts NaN
    // LAST, which would rank the one cell holding the whole corpus WORST
    // and make every nProbe < nCells search come back empty.
    val cents = Array(
      (0, Array.fill(4)(1.0f)),
      (1, Array.fill(4)(0.0f)),
      (2, Array.tabulate(4)(i => (i + 1).toFloat)))
    val ranked = Similarity.rankCells(cents, Seq(1f, 1f, 1f, 1f))
    assert(ranked.head == 1, s"NaN cell must rank first: $ranked")
    val asg = Seq(
      (0L, Seq(1f, 2f, 3f, 4f)), (1L, Seq(-1f, 0f, 2f, 1f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Similarity.ivfCellCol(col("embedding").cast("array<float>"), cents).as("cell"))
    assert(asg.filter(col("cell") =!= 1).count() == 0,
      "assignment must send every vector to the NaN cell")
    // and a query of the wrong dimensionality fails loudly, not with an
    // AIOOBE from the middle of the cosine loop / silent truncation
    intercept[IllegalArgumentException] {
      Similarity.rankCells(cents, Seq(1f, 1f))
    }
  }

  test("assignment survives codegen at 512 cells (reference-object matrix)") {
    // the composed argmax's generated code is O(nCells·dim): at 512 cells
    // janino rejects the method and Spark silently falls back to the
    // interpreted path corpus-wide. The native expression's code is O(1).
    // fallback=false turns a codegen failure into a thrown error, so this
    // test FAILS (not slows) if the expression ever regresses to inline
    // code growth.
    val ds = graft.tools.VectorFixtures.clustered(spark, 2048, 64, 512, 0.25, 13L)
    val cents = Similarity.ivfCentroids(ds, "vec_id", "embedding", 512)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val asg = ds.select(col("vec_id"),
        Similarity.ivfCellCol(col("embedding"), cents).as("cell"))
      assert(asg.filter(col("cell") < 0 || col("cell") >= 512).count() == 0)
      assert(asg.count() == 2048)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
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

  test("Lloyd refinement: empty cells keep their centroid; members re-center") {
    import spark.implicits._
    // every vector points near (1, 0): cell 1's opposite-direction
    // centroid captures nothing and must survive refinement UNCHANGED,
    // while cell 0's centroid moves to the members' mean direction
    val ds = (0 until 40).map { i =>
      val t = (i % 9 - 4) * 0.05
      (i.toLong, Array(math.cos(t).toFloat, math.sin(t).toFloat))
    }.toDF("vec_id", "embedding")
    val init = Array(0 -> Array(1f, 0f), 1 -> Array(-1f, 0f))
    val out = Similarity.kmeansRefine(ds, "embedding", init, iters = 2)
    assert(out.map(_._1).toSeq == Seq(0, 1), "cell ids must stay dense")
    assert(out(1)._2.toSeq == Seq(-1f, 0f), "empty cell must keep its centroid")
    // members are unit vectors symmetric around angle ~0 ⇒ mean direction
    // ≈ (c, 0) with c < 1 (shrinkage from averaging directions)
    assert(math.abs(out(0)._2(1)) < 0.03 &&
      out(0)._2(0) > 0.9f && out(0)._2(0) < 1.0f,
      s"refined centroid ${out(0)._2.toSeq} not at the mean direction")
    // zero iterations is the identity
    assert(Similarity.kmeansRefine(ds, "embedding", init, 0) sameElements init)
  }

  test("Lloyd refinement never worsens the spherical objective; recall holds") {
    val ds = graft.tools.VectorFixtures
      .clustered(spark, 1600, 64, 40, 0.25, 11L).cache()
    try {
      val sampled = Similarity.ivfCentroids(ds, "vec_id", "embedding", 16)
      val refined = Similarity.kmeansRefine(ds, "embedding", sampled, iters = 3)
      // training objective: mean cosine to the assigned (nearest) centroid.
      // Lloyd is monotone in it (up to float reduction order).
      def objective(cents: Array[(Int, Array[Float])]): Double = {
        val cexp = cents.map { case (c, v) =>
          Similarity.cosine(col("embedding"),
            array(v.toIndexedSeq.map(lit(_)): _*))
        }
        ds.select(greatest(cexp.toIndexedSeq: _*).as("m"))
          .agg(avg(col("m"))).head().getDouble(0)
      }
      val so = objective(sampled); val ro = objective(refined)
      assert(ro >= so - 1e-9, s"refined objective $ro below sampled $so")
      // and recall at the same probe budget does not regress
      def recall(cents: Array[(Int, Array[Float])]): Double = {
        val qs = (0L until 1600L by 200L).map(i =>
          ds.filter(col("vec_id") === i).select("embedding").head().getSeq[Float](0))
        qs.map { q =>
          val truth = Similarity.cosineTopK(ds, "vec_id", "embedding", q, 10)
            .collect().map(_.getLong(0)).toSet
          val probes = Similarity.rankCells(cents, q).take(2)
          val got = ds.select(col("vec_id"),
              Similarity.ivfCellCol(col("embedding"), cents).as("cell"),
              Similarity.cosine(col("embedding"),
                array(q.map(lit(_)): _*)).as("cos"))
            .filter(col("cell").isin(probes: _*))
            .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
            .collect().map(_.getLong(0)).toSet
          (truth & got).size.toDouble / truth.size
        }.sum / qs.size
      }
      val rs = recall(sampled); val rr = recall(refined)
      assert(rr >= rs - 0.05,
        s"refined recall $rr regressed vs sampled $rs at equal probes")
    } finally { ds.unpersist(); () }
  }
}
