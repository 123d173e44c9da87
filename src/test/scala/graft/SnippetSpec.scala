package graft

import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.query.Snippets

/** Snippet generation: driver-side replay of the deterministic rule
  * (best window by match count, earliest wins) as the ground truth.
  */
class SnippetSpec extends TestBase {

  private def truth(text: String, terms: Set[String], w: Int): Option[(String, Int)] = {
    val t = Analyzer.tokenize(text)
    val starts = 0 to math.max(t.length - w, 0)
    val scored = starts.map(i => (i, t.slice(i, i + w).count(terms)))
    val (bi, bs) = scored.maxBy { case (i, s) => (s, -i) }
    if (bs == 0) None else Some((t.slice(bi, bi + w).mkString(" "), bs))
  }

  test("snippets == driver replay on the generated corpus") {
    val src = tools.SourceCodeGen.generate(spark, 500).cache()
    val terms = Seq("import", "ident1", "val")
    val w = 8
    val got = Snippets.snippets(src, "doc_id", "content", terms, w)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    val want = src.select(col("doc_id"), col("content")).collect()
      .flatMap(r => truth(r.getString(1), terms.toSet, w)
        .map(r.getLong(0) -> _)).toMap
    assert(got == want && want.nonEmpty)
    src.unpersist()
  }

  test("earliest window wins ties; zero-match docs are dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, "x a y z z z a y x"),   // two windows score 1+... tie → earliest
      (2L, "no matches here at all"),
      (3L, "a a b x y z")          // best window has both a's
    ).toDF("doc_id", "text")
    val out = Snippets.snippets(df, "doc_id", "text", Seq("a"), window = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
      .sortBy(_._1)
    assert(!out.exists(_._1 == 2L))
    val d3 = out.find(_._1 == 3L).get
    assert(d3._2 == "a a b" && d3._3 == 2)
    val d1 = out.find(_._1 == 1L).get
    assert(d1._2.startsWith("x a") || d1._2.startsWith("a")) // earliest region
    assert(d1._3 == 1)
  }

  test("short docs: one window covering the whole doc") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, "q a")).toDF("doc_id", "text")
    val out = Snippets.snippets(df, "doc_id", "text", Seq("a"), window = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
      .sortBy(_._1)
    assert(out == Seq((1L, "a b", 1), (2L, "q a", 1)))
  }

  test("plan is map-only: no exchange, stays in whole-stage codegen") {
    val src = tools.SourceCodeGen.generate(spark, 100)
    val plan = Snippets.snippets(src, "doc_id", "content", Seq("import"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"snippet pass shuffles:\n$plan")
  }
}
