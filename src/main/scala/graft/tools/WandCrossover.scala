package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Bench
import graft.index.IndexCatalog
import graft.query.{BlockMaxTopK, QueryEngine}
import graft.score.BM25

/** Exhaustive vs block-max-WAND top-k latency on the DATA-SCALE probe
  * corpus — the regime where decode volume (not fixed job overhead) should
  * dominate, i.e. where pruning has something to prune. Reuses the
  * persisted index + block table at `/tmp/graft_xover_<files>` across runs.
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.WandCrossover 1600000 5"
  *
  * Prints one JSON line: per-query median seconds for both paths plus the
  * ratio. Queries are ordered from hottest (every-doc term) to narrow.
  */
object WandCrossover {

  def main(args: Array[String]): Unit = {
    val files = if (args.nonEmpty) args(0).toLong else 1600000L
    val reps = if (args.length > 1) args(1).toInt else 5
    // corpus modes:
    //  - "uniform" (default): the standard bench corpus. Measured result:
    //    NO sound bound can prune here — every 4096-doc range of a uniform
    //    corpus contains a near-top doc, so every range's true max ≥ θ
    //    (pruning stats show survivors == ranges for both bounds).
    //  - "skew": tf inflation by APPENDING tokens (rejected — inflates fl
    //    with tf, loosening the fl-free bound; kept for reproducibility).
    //  - "cluster": tf high in every 10th doc-id RANGE by REPLACING the
    //    first 20 tokens with `import` (fl preserved) — the doc-id-
    //    correlated score clustering real corpora get from ingestion
    //    order / doc-id assignment, which is what block-max pruning
    //    actually exploits.
    val mode = if (args.length > 2) args(2) else "uniform"
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root =
      if (mode == "uniform") s"/tmp/graft_xover_$files"
      else s"/tmp/graft_xover_${mode}_$files"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val idx = try IndexCatalog.read(spark, root) catch {
      case _: IllegalArgumentException | _: org.apache.spark.sql.AnalysisException =>
        mode match {
          case "uniform" => Bench.runBuild(spark, files, root)
          case "skew" =>
            val src = spark.read.parquet(Bench.corpusTable(spark, files))
              .withColumn("content", org.apache.spark.sql.functions.expr(
                "concat(content, repeat(' import', int(doc_id % 50) * 4))"))
            IndexCatalog.build(src, "doc_id", Seq("content", "path"), root)
          case "cluster" =>
            val src = spark.read.parquet(Bench.corpusTable(spark, files))
              .withColumn("content", org.apache.spark.sql.functions.expr(
                """CASE WHEN (doc_id DIV 4096) % 10 = 0
                  |THEN concat(repeat('import ', 20),
                  |            array_join(slice(split(content, ' '), 21, 1000000), ' '))
                  |ELSE content END""".stripMargin))
            IndexCatalog.build(src, "doc_id", Seq("content", "path"), root)
          case other => sys.error(s"unknown mode '$other' (uniform|skew|cluster)")
        }
        IndexCatalog.read(spark, root)
    }
    IndexCatalog.buildBlocks(spark, root)
    val (blocksRaw, bs, rpg) = IndexCatalog.readBlocks(spark, root)
    val blocks = blocksRaw.cache(); blocks.count()
    idx.termdict.cache().count()

    // hot → narrow: "import" appears in essentially every synthetic file
    // (the worst case for exhaustive decode), the others mix hot/narrow
    val queries = Seq("import", "fn match ident1", "val return ident42", "Modu", "ident7")

    // NOISE-FREE bound comparison: surviving-range counts under the tight
    // (max_tf, min_fl) bound vs the old fl-free tfn⁺ bound — the
    // algorithmic effect of the bound, independent of host timing swings
    val tight = BM25()
    val loose = new graft.score.ScoreModel {
      import org.apache.spark.sql.{Column, DataFrame}
      import org.apache.spark.sql.functions.{col, element_at, lit}
      def expansionColumns(e: DataFrame, s: graft.index.FieldStats): DataFrame =
        tight.expansionColumns(e, s)
      def score(j: DataFrame, s: graft.index.FieldStats, b: Seq[Double],
          q: Int, n: Int): DataFrame = tight.score(j, s, b, q, n)
      override def blockUpperBound(stats: graft.index.FieldStats,
          boosts: Seq[Double], qlenRaw: Int, numFields: Int): Option[Column] = {
        val perField = (0 until numFields).map { x =>
          val tf = element_at(col("max_tf"), x + 1).cast("double")
          (lit(2.2) * tf) / (lit(1.2 * 0.25) + tf) * lit(boosts(x))
        }
        Some(perField.reduce(_ + _) * col("idf") * col("eboost"))
      }
    }

    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    val rows = queries.map { q =>
      // warm both plans (codegen compile is a one-time cost)
      QueryEngine.query(idx, q, BM25(), limit = 10).collect()
      BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10, blockSize = bs, rangesPerGroup = rpg).collect()
      val ex = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        QueryEngine.query(idx, q, BM25(), limit = 10).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val wd = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10, blockSize = bs, rangesPerGroup = rpg).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val (em, wm) = (median(ex), median(wd))
      val pTight = graft.query.BlockMaxTopK
        .pruningStats(idx, blocks, q, tight, k = 10, blockSize = bs)
      val pLoose = graft.query.BlockMaxTopK
        .pruningStats(idx, blocks, q, loose, k = 10, blockSize = bs)
      def pj(p: Option[(Long, Long, Double)]): String = p match {
        case Some((t, s, _)) => s"""{"ranges":$t,"survive":$s}"""
        case None => "null"
      }
      f""""$q":{"exhaustive_p50":$em%.3f,"wand_p50":$wm%.3f,"speedup":${em / wm}%.2f,""" +
        f""""exhaustive_samples":[${ex.map(t => f"$t%.2f").mkString(",")}],""" +
        f""""wand_samples":[${wd.map(t => f"$t%.2f").mkString(",")}],""" +
        s""""prune_tight":${pj(pTight)},"prune_flfree":${pj(pLoose)}}"""
    }
    println(s"""{"files":$files,"cores":$cores,"reps":$reps,"queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
