package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Bench
import graft.index.IndexCatalog
import graft.query.QueryEngine
import graft.score.BM25

/** Per-rep latency breakdown of the bench query set against the persisted
  * bench index: distinguishes one-time plan/codegen cost from steady-state
  * scan cost.
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else "/tmp/graft_bench_index"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idx = try IndexCatalog.read(spark, root) catch {
      case _: Throwable => Bench.runBuild(spark, 200000, root); IndexCatalog.read(spark, root)
    }
    for (q <- Bench.QuerySet) {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        QueryEngine.query(idx, q, BM25(), limit = 10).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"query '$q%-20s' reps: " + times.map(t => f"$t%.2f").mkString(" "))
    }
    // where does a single cold query spend its time?
    val q = "val return ident42"
    val t0 = System.nanoTime()
    val df = QueryEngine.query(idx, q, BM25(), limit = 10)
    val t1 = System.nanoTime()
    df.collect()
    val t2 = System.nanoTime()
    println(f"plan-build (incl. expansion collect): ${(t1 - t0) / 1e9}%.2f s, execute: ${(t2 - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
