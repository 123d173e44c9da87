package graft

import org.apache.spark.sql.functions._

import graft.index.IndexBuilder
import graft.query.QueryEngine
import graft.score.BM25
import graft.tools.SourceCodeGen

/** Search-after (cursor pagination): pages must TILE the full result set
  * under the canonical page order (score_micro desc, doc_id asc) — no
  * overlap, no gap, flat cost per page. The ground truth is computed
  * driver-side from the full query result, so any cursor-predicate defect
  * (>= vs >, a missed micro tie, a doc_id tie broken the other way)
  * misaligns some page.
  */
class PaginationSpec extends TestBase {

  private def pageOrder(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSeq

  test("pages tile the full result set; first page == top-k; end is empty") {
    val src = SourceCodeGen.generate(spark, 700)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val q = "import ident1"
    val full = pageOrder(QueryEngine.query(idx, q, BM25()))
      .sortBy { case (id, sm) => (-sm, id) }
    assert(full.size > 25, "need multiple pages")
    val k = 7
    var cursor = (Long.MaxValue, Long.MinValue)
    val seen = Seq.newBuilder[(Long, Long)]
    var page = pageOrder(QueryEngine.searchAfter(idx, q, BM25(),
      cursor._1, cursor._2, k))
    // first page is the top-k of the canonical order
    assert(page == full.take(k))
    var guard = 0
    while (page.nonEmpty && guard < 200) {
      assert(page.size <= k)
      seen ++= page
      cursor = (page.last._2, page.last._1)
      page = pageOrder(QueryEngine.searchAfter(idx, q, BM25(),
        cursor._1, cursor._2, k))
      guard += 1
    }
    assert(seen.result() == full, "pages must tile the full order exactly")
    // a cursor past the end yields the empty page
    assert(pageOrder(QueryEngine.searchAfter(idx, q, BM25(),
      Long.MinValue, Long.MaxValue, k)).isEmpty)
    idx.unpersist()
  }

  test("a page is one top-k run: cursor filter below TakeOrderedAndProject") {
    val src = SourceCodeGen.generate(spark, 400)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val page = QueryEngine.searchAfter(idx, "import ident1", BM25(),
      1000000L, 0L, 10)
    val plan = page.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"page must be a top-k run, not a global sort:\n$plan")
    // the inner query's full sort must be eliminated under the page's
    // top-k (EliminateSorts) — a surviving global Sort means every page
    // pays a full result-set sort
    assert(!plan.contains("Sort "), s"global sort survived:\n$plan")
    idx.unpersist()
  }

  test("docFilter composes: filtered pages tile the filtered order") {
    val src = SourceCodeGen.generate(spark, 500)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val q = "import ident1"
    val allowed = src.filter(col("doc_id") % 2 === 0).select(col("doc_id"))
    val full = pageOrder(QueryEngine.query(idx, q, BM25(),
        docFilter = Some(allowed)))
      .sortBy { case (id, sm) => (-sm, id) }
    val p1 = pageOrder(QueryEngine.searchAfter(idx, q, BM25(),
      Long.MaxValue, Long.MinValue, 5, docFilter = Some(allowed)))
    val p2 = pageOrder(QueryEngine.searchAfter(idx, q, BM25(),
      p1.last._2, p1.last._1, 5, docFilter = Some(allowed)))
    assert(p1 ++ p2 == full.take(10) && p1.size == 5)
    assert((p1 ++ p2).forall(_._1 % 2 == 0))
    idx.unpersist()
  }
}
