package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.Bench

/** Per-job wall-time breakdown of one persisted index build (guide §1):
  * shows which stages scale with cores and which are fixed driver/commit
  * overhead. Usage: runMain graft.tools.BuildProfile <cores> <files>
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val files = args(1).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.runBuild(spark, files) // warmup (JIT, codegen, corpus table)
    final case class J(id: Int, t0: Long, var t1: Long = 0L)
    val jobs = scala.collection.mutable.ArrayBuffer.empty[J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs += J(js.jobId, System.nanoTime()) }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == je.jobId).foreach(_.t1 = System.nanoTime())
        }
    })
    val t0 = System.nanoTime()
    Bench.runBuild(spark, files)
    val t1 = System.nanoTime()
    println(f"== build total ${(t1 - t0) / 1e9}%.3f s, ${jobs.size} jobs")
    var prev = t0
    jobs.toSeq.sortBy(_.t0).foreach { j =>
      println(f"   gap ${(j.t0 - prev) / 1e9}%6.3f | job ${j.id}%3d ${(j.t1 - j.t0) / 1e9}%6.3f s")
      prev = if (j.t1 > 0) j.t1 else j.t0
    }
    println(f"   tail gap ${(t1 - prev) / 1e9}%6.3f")
    spark.stop()
  }
}
