package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Bench

/** Two-cluster-size scaling evidence (north_rule: throughput scaling
  * efficiency ≥ 0.8 from N to 4N executors). No real cluster exists in
  * this sandbox, so per driver instruction the same build job runs at two
  * parallelism levels — `local[N]` and `local[4N]` — on the SAME synthetic
  * input, and we report throughput at both plus
  * `efficiency = (throughput_4N / throughput_N) / 4`.
  *
  *   sbt "runMain graft.tools.ScalingBench 8 400000"
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cores]")
    .appName(s"graft-scaling-$cores")
    .config("spark.sql.shuffle.partitions", (2 * cores).toString)
    .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def measure(cores: Int, files: Long, warm: Boolean): (Double, Double) = {
    val spark = session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    // FULL-SIZE warmup: without it a later run in the same JVM benefits
    // from JIT compiled during an earlier one and reports skewed scaling
    if (warm) Bench.runBuild(spark, files)
    val (fps, secs, _) = Bench.runBuild(spark, files)
    spark.stop()
    // getOrCreate would reuse the stopped context's settings otherwise
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    (fps, secs)
  }

  def main(args: Array[String]): Unit = {
    // solo mode: one level per JVM (fairest) — `ScalingBench solo <cores> <files>`
    if (args.nonEmpty && args(0) == "solo") {
      val cores = args(1).toInt
      val files = args(2).toLong
      val reps = if (args.length > 3) args(3).toInt else 3
      // the sandbox VM is noisy: report the median of `reps` measured
      // builds (after one warmup) plus all samples
      val spark = session(cores)
      spark.sparkContext.setLogLevel("ERROR")
      Bench.runBuild(spark, files) // warmup
      val samples = (1 to reps).map(_ => Bench.runBuild(spark, files)._2)
      spark.stop()
      val med = samples.sorted.apply(samples.size / 2)
      val best = samples.min
      val all = samples.map(s => f"$s%.2f").mkString("[", ",", "]")
      println(f"""{"solo":{"cores":$cores,"files":$files,"files_per_sec":${files / med}%.1f,"median_secs":$med%.2f,""" +
        f""""best_secs":$best%.2f,"files_per_sec_best":${files / best}%.1f,"samples":$all}}""")
      return
    }
    val n = if (args.nonEmpty) args(0).toInt else 2
    val files = if (args.length > 1) args(1).toLong else 400000L
    val reps = if (args.length > 2) args(2).toInt else 2

    def measureMedian(cores: Int): (Double, Double, String) = {
      val spark = session(cores)
      spark.sparkContext.setLogLevel("ERROR")
      Bench.runBuild(spark, files) // warmup (JIT)
      val samples = (1 to reps).map(_ => Bench.runBuild(spark, files)._2)
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val med = samples.sorted.apply(samples.size / 2)
      (files / med, med, samples.map(s => f"$s%.2f").mkString("[", ",", "]"))
    }

    // Hardware ceiling probe: the sandbox VM oversubscribes vCPUs, so even
    // embarrassingly parallel CPU work does not scale 4x from N to 4N
    // threads. Measure that ceiling under identical JVM conditions and
    // report job efficiency both raw and normalized by it (a real cluster
    // adds independent machines; vCPU contention is a sandbox artifact).
    val hwN = hwUnitsPerSec(n)
    val hw4N = hwUnitsPerSec(4 * n)
    val hwScale = hw4N / hwN

    val (fpsN, secsN, sN) = measureMedian(n)
    val (fps4N, secs4N, s4N) = measureMedian(4 * n)
    val effRaw = (fps4N / fpsN) / 4.0
    val effNorm = (fps4N / fpsN) / hwScale
    println(f"""{"scaling":{"files":$files,"coresN":$n,"cores4N":${4 * n},""" +
      f""""files_per_sec_N":$fpsN%.1f,"files_per_sec_4N":$fps4N%.1f,""" +
      f""""secs_N":$secsN%.2f,"secs_4N":$secs4N%.2f,""" +
      f""""samples_N":$sN,"samples_4N":$s4N,""" +
      f""""hw_units_per_sec_N":$hwN%.2f,"hw_units_per_sec_4N":$hw4N%.2f,""" +
      f""""hw_scale_N_to_4N":$hwScale%.3f,""" +
      f""""efficiency_raw":$effRaw%.3f,"efficiency_hw_normalized":$effNorm%.3f}}""")
  }

  /** Aggregate throughput (work units/sec) of `threads` parallel busy
    * loops — the machine's own N→4N scaling ceiling.
    */
  private def hwUnitsPerSec(threads: Int): Double = {
    def run(): Double = {
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { seed =>
        new Thread(() => {
          var x = seed.toLong; var i = 0L
          while (i < 400000000L) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
          if (x == 42L) println("") // defeat dead-code elimination
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      threads / ((System.nanoTime() - t0) / 1e9)
    }
    run(); // warm
    Seq(run(), run()).max
  }
}
