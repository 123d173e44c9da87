package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{IvfIndex, VectorIndex}
import graft.pipeline.Similarity

/** Recall curve of the persisted IVF index vs exact brute-force cosine
  * top-k, with the persisted sign-LSH index at the SAME scan fraction as
  * the comparison column — the table a user choosing a quantizer family
  * reads (BENCH.md). IVF probes its nProbe best of nCells cells; LSH
  * probes its Hamming≤1 set of 1+nBits of 2^nBits buckets, with nBits
  * chosen so the two scan fractions match (nProbe/nCells ≈
  * (1+nBits)/2^nBits).
  *
  * Source selector as in [[AnnRecall]]: a testdata dir, or
  * `clustered:<n>` / `uniform:<n>` for the deterministic
  * [[VectorFixtures]] Gaussian mixture and its structureless control.
  *
  *   sbt "runMain graft.tools.IvfRecall clustered:20000 20 40"
  */
object IvfRecall {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "clustered:20000"
    val k = if (args.length > 1) args(1).toInt else 20
    val nQueries = if (args.length > 2) args(2).toInt else 40
    val nCells = if (args.length > 3) args(3).toInt else 64
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

    def freshRoot(tag: String): String = {
      val root = s"/tmp/graft_ivfrecall_${math.abs(dir.hashCode)}_$tag"
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      root
    }
    val ivfRoot = freshRoot(s"ivf$nCells")
    IvfIndex.build(emb, "vec_id", "embedding", 64, nCells, ivfRoot)
    // LSH comparison at matched scan fraction per nProbe column: pick
    // nBits with (1+nBits)/2^nBits closest to nProbe/nCells
    def lshBitsFor(frac: Double): Int =
      (4 to 10).minBy(b => math.abs((1.0 + b) / (1 << b) - frac))

    val step = math.max(1L, n / nQueries)
    val qids = (0L until n by step).take(nQueries)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val exacts = queries.map { case (_, qv) =>
      Similarity.cosineTopK(emb, "vec_id", "embedding", qv, k)
        .collect().map(_.getLong(0)).toSet
    }

    val lshRoots = scala.collection.mutable.Map.empty[Int, String]
    val rows = for (p <- Seq(1, 2, 4, 8).filter(_ <= nCells)) yield {
      var ihit = 0L; var lhit = 0L; var tot = 0L; var icand = 0L; var lcand = 0L
      val frac = p.toDouble / nCells
      val bits = lshBitsFor(frac)
      val lshRoot = lshRoots.getOrElseUpdate(bits, {
        val r = freshRoot(s"lsh$bits")
        VectorIndex.build(emb, "vec_id", "embedding", 64, bits, r)
        r
      })
      queries.zip(exacts).foreach { case ((_, qv), exact) =>
        val ivf = IvfIndex.annTopK(spark, ivfRoot, qv, k, nProbe = p)
          .collect().map(_.getLong(0)).toSet
        val lsh = VectorIndex.annTopK(spark, lshRoot, qv, k, maxHamming = 1)
          .collect().map(_.getLong(0)).toSet
        icand += IvfIndex.probeCandidates(spark, ivfRoot, qv, p).count()
        lcand += VectorIndex.probeCandidates(spark, lshRoot, qv).count()
        ihit += exact.intersect(ivf).size
        lhit += exact.intersect(lsh).size
        tot += exact.size
      }
      val nq = math.max(queries.length, 1)
      f""""p$p":{"frac":$frac%.4f,"ivf_recall_at_$k":${ihit.toDouble / math.max(tot, 1)}%.4f,""" +
        f""""ivf_avg_candidates":${icand.toDouble / nq}%.1f,""" +
        f""""lsh_bits":$bits,"lsh_frac":${(1.0 + bits) / (1 << bits)}%.4f,""" +
        f""""lsh_recall_at_$k":${lhit.toDouble / math.max(tot, 1)}%.4f,""" +
        f""""lsh_avg_candidates":${lcand.toDouble / nq}%.1f}"""
    }
    println(s"""{"dir":"$dir","k":$k,"n_cells":$nCells,"n_vectors":$n,"n_queries":${queries.length},${rows.mkString(",")}}""")
    spark.stop()
  }
}
