package graft

import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.query.Percolator

/** Percolation (reverse search): ground truth is a driver-side replay of
  * the prefix-match rule; the streaming test pins batch == stream.
  */
class PercolatorSpec extends TestBase {

  private val Queries = Seq(
    1L -> "import ident1",  // conjunctive 2-term
    2L -> "Modu",           // broad prefix
    3L -> "zzznope import", // one unmatched term -> conjunctive never fires
    4L -> "val")

  private def truth(rows: Seq[(Long, String)], requireAll: Boolean): Set[(Long, Long)] =
    (for {
      (id, text) <- rows
      toks = Analyzer.tokenize(text)
      (qid, q) <- Queries
      terms = Analyzer.tokenize(q)
      hit = if (requireAll) terms.forall(t => toks.exists(_.startsWith(t)))
            else terms.exists(t => toks.exists(_.startsWith(t)))
      if hit
    } yield (id, qid)).toSet

  test("percolate == driver replay, both composition modes") {
    val src = tools.SourceCodeGen.generate(spark, 700).cache()
    val rows = src.select(col("doc_id"), col("content")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    for (all <- Seq(true, false)) {
      val got = Percolator.percolate(src, "doc_id", Seq("content"), Queries,
        requireAll = all).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = truth(rows, all)
      assert(got == want && want.nonEmpty, s"requireAll=$all")
      if (all) assert(!got.exists(_._2 == 3L)) // zzznope never matches
    }
    src.unpersist()
  }

  test("a term may match in any field; empty query set matches nothing") {
    import spark.implicits._
    val df = Seq((1L, "import x", "y"), (2L, "q", "ident1 z"), (3L, "a", "b"))
      .toDF("doc_id", "f1", "f2")
    val got = Percolator.percolate(df, "doc_id", Seq("f1", "f2"),
      Seq(7L -> "import ident1"), requireAll = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 7L), (2L, 7L)))
    assert(Percolator.percolate(df, "doc_id", Seq("f1"), Seq.empty).isEmpty)
    assert(Percolator.percolate(df, "doc_id", Seq("f1"), Seq(8L -> " ")).isEmpty)
    // qid -1 collides with the internal no-match sentinel: refused loudly
    // instead of silently never emitting a row
    intercept[IllegalArgumentException] {
      Percolator.percolate(df, "doc_id", Seq("f1"), Seq(-1L -> "import"))
    }
  }

  test("plan is map-only (no exchange) — stream-safe by construction") {
    val src = tools.SourceCodeGen.generate(spark, 100)
    val plan = Percolator.percolate(src, "doc_id", Seq("content"), Queries)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"percolation shuffles:\n$plan")
  }

  test("streaming percolation (append mode, no state) == batch") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_perc").toString
    val out = s"$dir/out"; val chk = s"$dir/chk"; val in = s"$dir/in"
    val src = tools.SourceCodeGen.generate(spark, 300)
      .select("doc_id", "content")
    src.coalesce(2).write.parquet(in)
    val stream = spark.readStream.schema(src.schema).parquet(in)
    val q = Percolator.percolate(stream, "doc_id", Seq("content"), Queries)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Percolator.percolate(src, "doc_id", Seq("content"), Queries)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
