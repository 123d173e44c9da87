package graft

import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.{IndexBuilder, Mutations}
import graft.query.QueryEngine

/** Completion suggester ([[QueryEngine.complete]]) and match-set stats
  * aggregation ([[QueryEngine.matchStats]]) against driver-side replays.
  */
class CompletionStatsSpec extends TestBase {

  test("complete: (df desc, term asc) ranking, cut, live recount") {
    import spark.implicits._
    val df = Seq(
      (1L, "sun sun sand sea"),
      (2L, "sun sand x"),
      (3L, "sea sun y"),
      (4L, "moon")
    ).toDF("doc_id", "text")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
    // occurrence df: sun 4, sand 2, sea 2; (df desc, term asc)
    val got = QueryEngine.complete(idx, "s", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("sun", 4L), ("sand", 2L), ("sea", 2L)))
    assert(QueryEngine.complete(idx, "s", 2).collect().map(_.getString(0))
      .toSeq == Seq("sun", "sand"))
    // tombstoning doc 1 drops its occurrences from the ranking
    val t = Mutations.removeDocuments(idx, Seq(1L))
    val live = QueryEngine.complete(t, "s", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(live == Seq(("sand", 1L), ("sea", 1L), ("sun", 2L))
      .sortBy { case (tm, d) => (-d, tm) })
    // unmatched prefix is empty; bad args loud
    assert(QueryEngine.complete(idx, "zz", 5).isEmpty)
    intercept[IllegalArgumentException](QueryEngine.complete(idx, "", 5))
    intercept[IllegalArgumentException](QueryEngine.complete(idx, "s", 0))
  }

  test("complete on the generated corpus == dictionary replay") {
    val src = tools.SourceCodeGen.generate(spark, 400).cache()
    val idx = IndexBuilder.build(src, "doc_id", Seq("content"))
    val counts = src.select("content").collect()
      .flatMap(r => Analyzer.tokenize(r.getString(0)))
      .filter(_.startsWith("i"))
      .groupBy(identity).map { case (t, os) => (t, os.length.toLong) }
    val want = counts.toSeq.sortBy { case (t, d) => (-d, t) }.take(8)
    val got = QueryEngine.complete(idx, "i", 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    src.unpersist()
  }

  test("histogram drops null-valued matching docs (no null bin row)") {
    import spark.implicits._
    val df = Seq((1L, "alpha", Some(10L)), (2L, "alpha", None),
      (3L, "alpha", Some(200L))).toDF("doc_id", "text", "size")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
    val got = QueryEngine.histogram(idx, df, "doc_id", col("size"), 64.0,
      "alpha").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 2 (null size) is dropped, not emitted as a null bin
    assert(got == Seq((0L, 1L), (3L, 1L)))
  }

  test("indexStats == driver replay, live under tombstones") {
    import spark.implicits._
    val df = Seq((1L, "a b a"), (2L, "b c"), (3L, "d"))
      .toDF("doc_id", "text")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
    val r = QueryEngine.indexStats(idx).head()
    // 3 docs; vocab {a,b,c,d}; posting rows (a,1)(b,1)(b,2)(c,2)(d,3); 6 occ
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 4L, 5L, 6L)))
    val t = Mutations.removeDocuments(idx, Seq(1L))
    val l = QueryEngine.indexStats(t).head()
    // live: docs 2,3; vocab {b,c,d}; rows (b,2)(c,2)(d,3); 3 occ
    assert((l.getLong(0), l.getLong(1), l.getLong(2), l.getLong(3)) ==
      ((2L, 3L, 3L, 3L)))
    // fully tombstoned: all-zero row, never SQL NULL
    val z = QueryEngine.indexStats(
      Mutations.removeDocuments(idx, Seq(1L, 2L, 3L))).head()
    assert((z.getLong(0), z.getLong(1), z.getLong(2), z.getLong(3)) ==
      ((0L, 0L, 0L, 0L)))
  }

  test("boolQuery nests: a bool result is a valid filter clause") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c"),
      (2L, "a b"),
      (3L, "a c x"),
      (4L, "a")
    ).toDF("doc_id", "text")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
    // inner bool: must=b, mustNot=x  -> {1, 2}
    val inner = QueryEngine.boolQuery(idx, graft.score.BM25(),
      must = "b", mustNot = "x")
    // outer bool: must=a, filter=inner -> scored 'a' over {1, 2}
    val outer = QueryEngine.boolQuery(idx, graft.score.BM25(),
      must = "a", docFilter = Some(inner))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val direct = QueryEngine.query(idx, "a", graft.score.BM25())
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(outer.keySet == Set(1L, 2L))
    outer.foreach { case (id, s) =>
      assert(math.abs(s - direct(id)) < 1e-12) }
  }

  test("matchStats == driver replay; empty match set degenerates") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta"),
      (2L, "alpha"),
      (3L, "gamma delta x")
    ).toDF("doc_id", "text")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
    // match "alpha" = docs 1, 2; lengths 10, 5
    val r = QueryEngine.matchStats(idx, df, "doc_id", length(col("text")),
      "alpha").head()
    assert(r.getLong(0) == 2L && r.getDouble(1) == 5.0 &&
      r.getDouble(2) == 10.0 && r.getDouble(3) == 15.0 &&
      r.getDouble(4) == 7.5)
    // no matches: count 0, null extremes (the SQL degenerate row)
    val z = QueryEngine.matchStats(idx, df, "doc_id", length(col("text")),
      "zzz").head()
    assert(z.getLong(0) == 0L && z.isNullAt(1) && z.isNullAt(4))
  }
}
