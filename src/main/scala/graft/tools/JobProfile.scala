package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-Spark-job wall-time breakdown of one contract query (guide §1.1/§7.1
  * without a UI): runs the query `reps` times and prints, for the LAST rep,
  * every job's wall time, stage count and task count plus the gaps between
  * jobs (driver-side planning / collect round-trips).
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <reps> <query> [query...]
  */
object JobProfile {
  private final case class JobRec(id: Int, t0: Long, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, desc: String = "")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = scala.collection.mutable.ArrayBuffer.empty[JobRec]
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (record) jobs.synchronized {
          jobs += JobRec(js.jobId, System.nanoTime(),
            desc = Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse(""))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (record) jobs.synchronized {
          jobs.find(_.id == je.jobId).foreach(_.t1 = System.nanoTime())
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) jobs.synchronized {
          jobs.lastOption.foreach { j =>
            j.stages += 1; j.tasks += sc.stageInfo.numTasks
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    for (n <- names; fn = SparkEntry.queries(n)) {
      // warm reps (cache builds, codegen)
      (1 until reps).foreach { _ =>
        fn(spark, sfDir).count()
        graft.pipeline.CacheScope.releaseGlobal()
      }
      jobs.clear()
      record = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t1 = System.nanoTime()
      record = false
      graft.pipeline.CacheScope.releaseGlobal()
      println(f"== $n total ${(t1 - t0) / 1e9}%.3f s, ${jobs.size} jobs")
      var prev = t0
      jobs.toSeq.sortBy(_.t0).foreach { j =>
        val gap = (j.t0 - prev) / 1e9
        val dur = (j.t1 - j.t0) / 1e9
        prev = if (j.t1 > 0) j.t1 else j.t0
        println(f"   gap $gap%6.3f | job ${j.id}%3d $dur%6.3f s " +
          f"stages=${j.stages} tasks=${j.tasks} ${j.desc.take(80)}")
      }
      println(f"   tail gap ${(t1 - prev) / 1e9}%6.3f")
    }
    spark.stop()
  }
}
