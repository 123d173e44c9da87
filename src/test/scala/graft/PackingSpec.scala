package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Packing

/** Greedy sequence packing ([[Packing]]): first-fit semantics, the
  * budget invariant, oversize handling, determinism under partitioning,
  * and the salted-shard split for skew.
  */
class PackingSpec extends TestBase {

  private def mk(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("first-fit walk: fills until overflow, then opens the next pack") {
    // tokens: 3, 4, 2, 5, 1 with budget 8 → packs [3,4] [2,5,1]
    val df = mk(Seq(
      (0L, "a", words(3)), (1L, "a", words(4)), (2L, "a", words(2)),
      (3L, "a", words(5)), (4L, "a", words(1))))
    val got = Packing.packGreedy(df, "doc_id", "text", "source", budget = 8)
      .orderBy("doc_id")
      .select("pack_id", "pack_pos", "oversize")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq((0L, 1L, false), (0L, 2L, false), (1L, 1L, false),
      (1L, 2L, false), (1L, 3L, false)))
  }

  test("a doc larger than the budget gets its own flagged pack") {
    // tokens: 2, 10, 2 with budget 5 → [2] [10]* [2]
    val df = mk(Seq(
      (0L, "a", words(2)), (1L, "a", words(10)), (2L, "a", words(2))))
    val got = Packing.packGreedy(df, "doc_id", "text", "source", budget = 5)
      .orderBy("doc_id")
      .select("pack_id", "pack_pos", "oversize")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq((0L, 1L, false), (1L, 1L, true), (2L, 1L, false)))
  }

  test("no pack exceeds the budget unless it is a single oversize doc") {
    val df = mk((0L until 300L).map(i =>
      (i, s"src${i % 3}", words(1 + (i * 7 % 23).toInt))))
    val packed = Packing.packGreedy(df, "doc_id", "text", "source", budget = 24)
    val bad = packed.groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("docs"),
        max(col("oversize").cast("int")).as("over"))
      .filter(col("fill") > 24 && !(col("docs") === 1 && col("over") === 1))
    assert(bad.count() == 0L)
    // and packing is exhaustive: every doc appears exactly once
    assert(packed.count() == 300L)
    assert(packed.select("doc_id").distinct().count() == 300L)
  }

  test("pack assignment is partitioning-invariant") {
    val df = mk((0L until 200L).map(i =>
      (i, s"src${i % 4}", words(1 + (i * 11 % 17).toInt))))
    def run(parts: Int) =
      Packing.packGreedy(df.repartition(parts), "doc_id", "text", "source",
        budget = 20)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(1), r.getString(0), r.getLong(3),
          r.getLong(4))).toSeq
    assert(run(1) == run(13))
  }

  test("saltedShard is a pure function of (shard, id) and bounds groups") {
    import spark.implicits._
    val df = mk((0L until 1000L).map(i => (i, "one", words(2))))
      .withColumn("sub", Packing.saltedShard(col("source"), col("doc_id"), 8))
    val sizes = df.groupBy("sub").count().collect().map(_.getLong(1))
    assert(sizes.length == 8 && sizes.max < 1000)
    // pure: recomputing yields the identical assignment
    val again = mk((0L until 1000L).map(i => (i, "one", words(2))))
      .withColumn("sub", Packing.saltedShard(col("source"), col("doc_id"), 8))
    assert(df.select("doc_id", "sub").except(again.select("doc_id", "sub"))
      .count() == 0L)
  }

  test("packStats reports fill and clamps oversize utilization to 1") {
    val df = mk(Seq(
      (0L, "a", words(3)), (1L, "a", words(4)), (2L, "a", words(9))))
    val stats = Packing.packStats(
      Packing.packGreedy(df, "doc_id", "text", "source", budget = 8), 8)
      .orderBy("pack_id")
      .select("docs", "fill", "utilization")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(stats == Seq((2L, 7L, 7.0 / 8.0), (1L, 9L, 1.0)))
  }
}
