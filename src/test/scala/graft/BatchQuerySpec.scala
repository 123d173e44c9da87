package graft

import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, Mutations}
import graft.query.QueryEngine
import graft.score.{BM25, ScoreModel, ZeroToOne}

/** Batched multi-query search: per-(qid, doc) scores must be IDENTICAL to
  * running each query alone — batch is an execution strategy, never a
  * semantics change.
  */
class BatchQuerySpec extends TestBase {

  private val Queries = Seq(
    1L -> "import ident1",
    2L -> "Modu",              // broad prefix, many expansions
    3L -> "val ident2 ident3", // three terms
    4L -> "zzznope",           // no matches at all
    5L -> "import")            // shares a term with query 1

  private def single(idx: graft.index.InvertedIndex, m: ScoreModel,
      q: String): Seq[(Long, Double)] =
    QueryEngine.query(idx, q, m).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def assertBatchMatchesSingles(idx: graft.index.InvertedIndex,
      m: ScoreModel, cap: Int = 65536): Unit = {
    val batch = QueryEngine.batchQuery(idx, Queries, m,
        maxCollectedExpansions = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy { case (d, s) => (-s, d) }.toSeq)
      .toMap
    var nonEmpty = 0
    for ((qid, q) <- Queries) {
      val want = single(idx, m, q)
      val got = batch.getOrElse(qid, Seq.empty)
      assert(got == want, s"qid=$qid '$q' under $m: batch != single")
      nonEmpty += (if (want.nonEmpty) 1 else 0)
    }
    assert(nonEmpty >= 3, "test workload mostly vacuous")
  }

  test("BM25 batch == per-query singles (collected path)") {
    val src = tools.SourceCodeGen.generate(spark, 1000)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    assertBatchMatchesSingles(idx, BM25())
    idx.unpersist()
  }

  test("zero-to-one batch == per-query singles (per-query qlen honored)") {
    val src = tools.SourceCodeGen.generate(spark, 600)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    // Queries have different term counts (qlen 1, 2, 3) — a batch that used
    // one global qlen would diverge on every multi-term query
    assertBatchMatchesSingles(idx, ZeroToOne())
    idx.unpersist()
  }

  test("non-collected fallback path == singles, under tombstones") {
    val src = tools.SourceCodeGen.generate(spark, 800)
    val idx0 = IndexBuilder.build(src, "doc_id", Seq("content", "path"))
    val idx = Mutations.removeDocuments(idx0, (0L until 40L)).cached()
    // cap 1 forces the startsWith-scan DataFrame plan for the whole batch
    assertBatchMatchesSingles(idx, BM25(), cap = 1)
    idx.unpersist()
  }

  test("per-query top-k: k rows per query, ordered (score desc, doc_id asc)") {
    val src = tools.SourceCodeGen.generate(spark, 900)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val k = 7
    val rows = QueryEngine.batchQuery(idx, Queries, BM25(), k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val byQ = rows.groupBy(_._1)
    for ((qid, q) <- Queries) {
      val want = single(idx, BM25(), q).take(k)
      val got = byQ.getOrElse(qid, Seq.empty).map(t => (t._2, t._3)).toSeq
      assert(got == want, s"top-$k mismatch for qid=$qid '$q'")
    }
    // global order: qid asc, then (score desc, doc_id asc) within
    assert(rows == rows.sortBy { case (qid, d, s) => (qid, -s, d) })
    idx.unpersist()
  }

  test("driver fan-out over the cap routes to the distributed plan, same results") {
    val src = tools.SourceCodeGen.generate(spark, 500)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    // many queries sharing one broad prefix: the DISTINCT-term resolve fits
    // the cap but |queries| × expansions exceeds it — the fan-out guard
    // must route to the fallback plan without changing any result
    val qs = (1L to 30L).map(i => i -> "Modu")
    val nExp = QueryEngine.expandTerm(idx, "Modu").count().toInt
    assert(nExp > 1 && nExp * 30 > nExp + 10)
    val small = QueryEngine.batchQuery(idx, qs, BM25(), k = 5,
        maxCollectedExpansions = nExp + 10) // fits resolve, not fan-out
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val big = QueryEngine.batchQuery(idx, qs, BM25(), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(small == big && small.nonEmpty)
    idx.unpersist()
  }

  test("duplicate qids are rejected; empty workload yields empty frame") {
    val src = tools.SourceCodeGen.generate(spark, 100)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content"))
    intercept[IllegalArgumentException] {
      QueryEngine.batchQuery(idx, Seq(1L -> "a", 1L -> "b"), BM25())
    }
    assert(QueryEngine.batchQuery(idx, Seq.empty, BM25()).isEmpty)
    assert(QueryEngine.batchQuery(idx, Seq(9L -> "  "), BM25()).isEmpty)
  }
}
