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
    // "skew" mode: same corpus with a DETERMINISTIC tf-skew overlay —
    // every 50th-cycle doc gets up to 49·4 extra "import" occurrences, so
    // per-block maxTf varies by ~200× instead of being flat. This is the
    // distribution real corpora have and block-max metadata exploits; the
    // uniform synthetic corpus is pruning's worst case.
    val skew = args.length > 2 && args(2) == "skew"
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root = s"/tmp/graft_xover_${if (skew) "skew_" else ""}$files"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val idx = try IndexCatalog.read(spark, root) catch {
      case _: IllegalArgumentException | _: org.apache.spark.sql.AnalysisException =>
        if (!skew) Bench.runBuild(spark, files, root)
        else {
          val src = spark.read.parquet(Bench.corpusTable(spark, files))
            .withColumn("content", org.apache.spark.sql.functions.expr(
              "concat(content, repeat(' import', int(doc_id % 50) * 4))"))
          IndexCatalog.build(src, "doc_id", Seq("content", "path"), root)
        }
        IndexCatalog.read(spark, root)
    }
    IndexCatalog.buildBlocks(spark, root)
    val (blocksRaw, bs) = IndexCatalog.readBlocks(spark, root)
    val blocks = blocksRaw.cache(); blocks.count()
    idx.termdict.cache().count()

    // hot → narrow: "import" appears in essentially every synthetic file
    // (the worst case for exhaustive decode), the others mix hot/narrow
    val queries = Seq("import", "fn match ident1", "val return ident42", "Modu", "ident7")

    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    val rows = queries.map { q =>
      // warm both plans (codegen compile is a one-time cost)
      QueryEngine.query(idx, q, BM25(), limit = 10).collect()
      BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10, blockSize = bs).collect()
      val ex = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        QueryEngine.query(idx, q, BM25(), limit = 10).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val wd = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10, blockSize = bs).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val (em, wm) = (median(ex), median(wd))
      f""""$q":{"exhaustive_p50":$em%.3f,"wand_p50":$wm%.3f,"speedup":${em / wm}%.2f,""" +
        f""""exhaustive_samples":[${ex.map(t => f"$t%.2f").mkString(",")}],""" +
        f""""wand_samples":[${wd.map(t => f"$t%.2f").mkString(",")}]}"""
    }
    println(s"""{"files":$files,"cores":$cores,"reps":$reps,"queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
