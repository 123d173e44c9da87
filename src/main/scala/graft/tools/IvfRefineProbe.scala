package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Recall@k of the SAMPLED IVF quantizer vs the same sample after Lloyd
  * refinement ([[Similarity.kmeansRefine]]), at equal probe budgets — the
  * number that justifies `IvfIndex.build(refineIters = ...)` (BENCH.md
  * "IVF refinement"). Also prints the spherical objective (mean cosine to
  * the assigned centroid) per iteration count.
  *
  *   sbt "runMain graft.tools.IvfRefineProbe clustered:20000 20 40 64 3"
  */
object IvfRefineProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "clustered:20000"
    val k = if (args.length > 1) args(1).toInt else 20
    val nQueries = if (args.length > 2) args(2).toInt else 40
    val nCells = if (args.length > 3) args(3).toInt else 64
    val iters = if (args.length > 4) args(4).toInt else 3
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = (dir.split(":", 2) match {
      case Array("clustered", nv) =>
        VectorFixtures.clustered(spark, nv.toInt, 64,
          centers = math.max(1, nv.toInt / 40), noise = 0.25, seed = 7L)
      case Array("uniform", nv) =>
        VectorFixtures.uniform(spark, nv.toInt, 64, seed = 7L)
      case _ => spark.read.parquet(s"$dir/embeddings.parquet")
    }).cache()
    val n = emb.count()
    println(s"corpus $dir n=$n nCells=$nCells k=$k queries=$nQueries iters=$iters")

    val sampled = Similarity.ivfCentroids(emb, "vec_id", "embedding", nCells)

    def objective(cents: Array[(Int, Array[Float])]): Double = {
      val cell = Similarity.ivfCellCol(col("embedding"), cents)
      // cosine to the ASSIGNED centroid via a join with the centroid table
      val spark2 = emb.sparkSession
      import spark2.implicits._
      val cdf = cents.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "cv")
      emb.select(col("embedding"), cell.as("cell"))
        .join(broadcast(cdf), "cell")
        .select(Similarity.cosine(col("embedding"),
          col("cv").cast("array<float>")).as("c"))
        .agg(avg("c")).head().getDouble(0)
    }

    val step = math.max(1L, n / nQueries)
    val queries = (0L until n by step).take(nQueries).map { i =>
      emb.filter(col("vec_id") === i).select("embedding").head().getSeq[Float](0)
    }
    val truths = queries.map { q =>
      Similarity.cosineTopK(emb, "vec_id", "embedding", q, k)
        .collect().map(_.getLong(0)).toSet
    }

    def recallAt(cents: Array[(Int, Array[Float])], nProbe: Int): Double = {
      val rs = queries.zip(truths).map { case (q, truth) =>
        val probes = Similarity.rankCells(cents, q).take(nProbe)
        val got = emb.select(col("vec_id"),
            Similarity.ivfCellCol(col("embedding"), cents).as("cell"),
            Similarity.cosine(col("embedding"),
              array(q.map(lit(_)): _*)).as("cos"))
          .filter(col("cell").isin(probes: _*))
          .orderBy(col("cos").desc, col("vec_id").asc).limit(k)
          .collect().map(_.getLong(0)).toSet
        (truth & got).size.toDouble / truth.size
      }
      rs.sum / rs.length
    }

    var cur = sampled
    (0 to iters).foreach { it =>
      if (it > 0) cur = Similarity.kmeansRefine(emb, "embedding", cur, 1)
      println(f"iters=$it obj=${objective(cur)}%.5f")
    }
    val refined = cur
    println(f"${"nProbe"}%8s ${"sampled"}%10s ${"refined"}%10s")
    for (np <- Seq(1, 2, 4, 8, 16).filter(_ <= nCells)) {
      val a = recallAt(sampled, np)
      val b = recallAt(refined, np)
      println(f"$np%8d $a%10.3f $b%10.3f")
    }
    spark.stop()
  }
}
