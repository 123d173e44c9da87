package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.VectorIndex
import graft.pipeline.Similarity

/** Recall curve of the persisted ANN index's multiprobe search vs exact
  * brute-force cosine top-k (the q15 oracle): recall@k at Hamming radius
  * 0 / 1 / 2, with the buckets-probed and candidates-scored cost of each —
  * the table a user tuning (nBits, maxHamming) reads (BENCH.md).
  *
  * Source selector (first arg): a testdata dir (driver embeddings,
  * uniform-random — the worst case), or `clustered:<n>` / `uniform:<n>`
  * for the deterministic [[VectorFixtures]] Gaussian-mixture fixture and
  * its structureless control — the clustered number is what a real
  * embedding-space user would see.
  *
  *   sbt "runMain graft.tools.AnnRecall /root/testdata/sf0.1 20 40"
  *   sbt "runMain graft.tools.AnnRecall clustered:20000 20 40"
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 20
    val nQueries = if (args.length > 2) args(2).toInt else 40
    val nBits = if (args.length > 3) args(3).toInt else 8
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = (dir.split(":", 2) match {
      case Array("clustered", nv) =>
        // 40 vectors per cluster, noise 0.25 vs unit-Gaussian centers: a
        // tight-but-not-degenerate mixture (σ_cluster/σ_center = 0.25)
        VectorFixtures.clustered(spark, nv.toInt, 64,
          centers = math.max(1, nv.toInt / 40), noise = 0.25, seed = 7L)
      case Array("uniform", nv) =>
        VectorFixtures.uniform(spark, nv.toInt, 64, seed = 7L)
      case _ => spark.read.parquet(s"$dir/embeddings.parquet")
    }).cache()
    val n = emb.count()
    val root = s"/tmp/graft_annrecall_${math.abs(dir.hashCode)}_$nBits"
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    VectorIndex.build(emb, "vec_id", "embedding", 64, nBits, root)

    // deterministic query sample: every (n/nQueries)-th vec_id
    val step = math.max(1L, n / nQueries)
    val qids = (0L until n by step).take(nQueries)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))

    val rows = for (h <- 0 to 2) yield {
      var hit = 0L; var tot = 0L; var cand = 0L
      queries.foreach { case (_, qv) =>
        val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", qv, k)
          .collect().map(_.getLong(0)).toSet
        val approx = VectorIndex.annTopK(spark, root, qv, k, maxHamming = h)
          .collect().map(_.getLong(0)).toSet
        cand += VectorIndex.probeCandidates(spark, root, qv, maxHamming = h).count()
        hit += exact.intersect(approx).size; tot += exact.size
      }
      val buckets = h match {
        case 0 => 1
        case 1 => 1 + nBits
        case 2 => 1 + nBits + nBits * (nBits - 1) / 2
      }
      f""""h$h":{"recall_at_$k":${hit.toDouble / math.max(tot, 1)}%.4f,"buckets_probed":$buckets,""" +
        f""""of_buckets":${1 << nBits},"avg_candidates":${cand.toDouble / math.max(queries.length, 1)}%.1f}"""
    }
    println(s"""{"dir":"$dir","k":$k,"n_bits":$nBits,"n_vectors":$n,"n_queries":${queries.length},${rows.mkString(",")}}""")
    spark.stop()
  }
}
