package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventWindows

/** Streaming deployment shape: the `append`-mode file sink must emit exactly
  * the closed-window subset of the `complete`-mode (oracle-harness) result.
  * A window is closed when the final watermark (max event ts − 10 min)
  * passed its end; windows still open at end-of-stream are deliberately
  * withheld by append semantics.
  */
class EventWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("append-mode file sink == complete-mode result on closed windows") {
    val events = "/root/testdata/sf0.001/events.parquet"
    val complete = EventWindows.runAvailableNow(spark, events)
      .select("window_start", "event_type", "n", "sum_value_c")

    val outDir = java.nio.file.Files
      .createTempDirectory("graft_ew_append_").toString + "/out"
    val append = EventWindows.runAppendToDir(spark, events, outDir)
      .select("window_start", "event_type", "n", "sum_value_c")

    val maxTs = spark.read.parquet(events)
      .agg(max(col("ts").cast("timestamp"))).head().getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val closed = complete
      .filter(col("window_start") + expr("INTERVAL 5 MINUTES") <= lit(horizon))

    assert(append.count() > 0, "append sink emitted nothing")
    assert(append.exceptAll(closed).count() == 0 &&
      closed.exceptAll(append).count() == 0,
      "append-mode output differs from complete-mode closed windows")
  }
}
