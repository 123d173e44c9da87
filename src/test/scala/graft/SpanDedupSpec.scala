package graft

import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.pipeline.{CacheScope, Dedup}

/** Span-level dedup: driver-side sliding-window replay as ground truth. */
class SpanDedupSpec extends TestBase {

  private def spansOf(text: String, n: Int): Seq[String] = {
    val t = Analyzer.tokenize(text)
    if (t.length < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq
  }

  test("spanDupStats == driver replay (corpus with planted duplicates)") {
    import spark.implicits._
    val base = tools.SourceCodeGen.generate(spark, 300)
      .select(col("doc_id"), col("content").as("text"))
    // plant exact clones so duplicate spans exist for sure
    val clones = base.filter(col("doc_id") < 20)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val docs = base.unionByName(clones).cache()
    val n = 6
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val all = rows.flatMap { case (id, t) => spansOf(t, n).map((id, _)) }
    val dupKeys = all.groupBy(_._2)
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val want = all.groupBy(_._1).map { case (id, ss) =>
      (id, ss.length.toLong, ss.count(s => dupKeys(s._2)).toLong) }.toSet
    CacheScope.withScope { scope =>
      val got = Dedup.spanDupStats(docs, "doc_id", "text", n, scope = scope)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want && want.exists(_._3 > 0))
    }
    docs.unpersist()
  }

  test("duplicateSpans: counts, minDocs threshold, repeat-within-doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),      // span "a b c" once
      (2L, "x a b c y"),      // shares "a b c"
      (3L, "a b c z a b c"),  // "a b c" twice IN ONE doc
      (4L, "q r s t u")       // unique
    ).toDF("doc_id", "text")
    val dup = Dedup.duplicateSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // only "a b c" is shared by >= 2 DISTINCT docs: docs {1,2,3}, 4 occs
    assert(dup.length == 1 && dup.head._2 == 3L && dup.head._3 == 4L)
    // a span repeated only WITHIN one doc is not a cross-doc duplicate
    val strict = Dedup.duplicateSpans(docs.filter(col("doc_id") >= 3),
      "doc_id", "text", n = 3)
    assert(strict.isEmpty)
    // short docs produce no spans at all
    CacheScope.withScope { scope =>
      val st = Dedup.spanDupStats(
        Seq((9L, "a b")).toDF("doc_id", "text"), "doc_id", "text", n = 3,
        scope = scope)
      assert(st.isEmpty)
    }
  }
}
