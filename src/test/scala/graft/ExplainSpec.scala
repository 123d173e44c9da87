package graft

import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, Mutations}
import graft.query.QueryEngine
import graft.score.{BM25, ZeroToOne}
import graft.tools.SourceCodeGen

/** Score explanation: the per-(doc, query-term) breakdown must be the
  * scoring pipeline stopped before the final sum — so the contributions
  * must sum back to the query's score EXACTLY (same f64 expressions, same
  * fold), on every resolution path and under tombstones. Any drift between
  * explain and query (a different idf, a missed live-df recount, a filter
  * applied on one side only) breaks the sum.
  */
class ExplainSpec extends TestBase {

  private def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, String, String, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3), r.getDouble(4))).toSeq

  test("contributions sum to the query score; winners are real expansions") {
    val src = SourceCodeGen.generate(spark, 800)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val q = "import ident1"
    val want = scores(QueryEngine.query(idx, q, BM25()))
    val brk = rows(QueryEngine.explain(idx, q, BM25()))
    assert(brk.nonEmpty && want.nonEmpty)
    // exact sum: explain picks the same max row the scorer aggregates
    // (modulo micro-tie argmax, whose score differs from max by < 1e-6)
    val sums = brk.groupBy(_._1).view.mapValues(_.map(_._5).sum)
    assert(sums.keySet == want.keySet, "explain covers exactly the matched docs")
    sums.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-6, s"doc $id: $s != ${want(id)}")
    }
    // each winner expands its query term
    val qterms = Map(0 -> "import", 1 -> "ident1")
    brk.foreach { case (_, qti, qterm, best, ts) =>
      assert(qterm == qterms(qti))
      assert(best.startsWith(qterm), s"$best does not expand $qterm")
      assert(ts > 0)
    }
    // a doc matching both terms carries two rows, in (doc, qti) order
    assert(brk.exists(_._2 == 0) && brk.exists(_._2 == 1))
    assert(brk == brk.sortBy(r => (r._1, r._2)))
    idx.unpersist()
  }

  test("k and docFilter restrict the breakdown; paths agree; zto throws") {
    val src = SourceCodeGen.generate(spark, 800)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val q = "import ident1"
    // k: breakdown docs == the query's top-k docs
    val top5 = QueryEngine.query(idx, q, BM25(), limit = 5)
      .collect().map(_.getLong(0)).toSet
    val brk5 = rows(QueryEngine.explain(idx, q, BM25(), k = 5))
    assert(brk5.map(_._1).toSet == top5)
    // docFilter: same composition seam as query()
    val allowed = src.filter(col("doc_id") % 2 === 0).select(col("doc_id"))
    val brkF = rows(QueryEngine.explain(idx, q, BM25(), docFilter = Some(allowed)))
    val full = rows(QueryEngine.explain(idx, q, BM25()))
    assert(brkF == full.filter(_._1 % 2 == 0) && brkF.nonEmpty)
    // collected and startsWith-fallback plans produce the identical breakdown
    val brkNc = rows(QueryEngine.explain(idx, q, BM25(),
      maxCollectedExpansions = 1))
    assert(brkNc == full)
    // zero-to-one has no per-term decomposition (greedy holistic finalize)
    intercept[UnsupportedOperationException] {
      QueryEngine.explain(idx, q, ZeroToOne()).collect()
    }
    idx.unpersist()
  }

  test("tombstones: removed docs vanish and live-df idf flows through") {
    val src = SourceCodeGen.generate(spark, 600)
    val idx0 = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val q = "import ident1"
    val victims = rows(QueryEngine.explain(idx0, q, BM25()))
      .map(_._1).distinct.take(3)
    val idx = Mutations.removeDocuments(idx0, victims)
    val want = scores(QueryEngine.query(idx, q, BM25()))
    val brk = rows(QueryEngine.explain(idx, q, BM25()))
    assert(victims.forall(v => !brk.exists(_._1 == v)))
    val sums = brk.groupBy(_._1).view.mapValues(_.map(_._5).sum)
    assert(sums.keySet == want.keySet && want.nonEmpty)
    sums.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-6, s"doc $id: $s != ${want(id)}")
    }
    idx0.unpersist()
  }
}
