package graft

import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, Mutations}
import graft.query.{QueryEngine, ShardedSearch}
import graft.score.{BM25, ZeroToOne}

/** Significant terms ([[QueryEngine.significantTerms]]) against hand-computed
  * lift, and DFS scatter-gather top-k ([[ShardedSearch.dfsTopK]]) against the
  * single-index query it must be indistinguishable from.
  */
class SigTermsDfsSpec extends TestBase {

  test("significantTerms: lift over doc counts == hand truth; floor + cut") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b x"),
      (2L, "a b"),
      (3L, "a c"),
      (4L, "c d")
    ).toDF("doc_id", "text")
    val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
    // match set of "b" = {1, 2}; fg_n = 2, bg_n = 4. Doc-count lifts:
    //   b: (2/2)/(2/4) = 2      x: (1/2)/(1/4) = 2      a: (2/2)/(3/4) = 4/3
    val got = QueryEngine.significantTerms(idx, "b", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // order: score desc, term asc — b and x tie at 2.0, b first
    assert(got.map(_._1) == Seq("b", "x", "a"))
    assert(got == Seq(("b", 2L, 2L, 2.0), ("x", 1L, 1L, 2.0),
      ("a", 2L, 3L, 4.0 / 3.0)))
    // minDocCount suppresses the one-off x; topN cuts after ordering
    val floored = QueryEngine.significantTerms(idx, "b", topN = 10,
      minDocCount = 2L).collect().map(_.getString(0)).toSeq
    assert(floored == Seq("b", "a"))
    val cut = QueryEngine.significantTerms(idx, "b", topN = 1)
      .collect().map(_.getString(0)).toSeq
    assert(cut == Seq("b"))
    // a query matching nothing aggregates nothing
    assert(QueryEngine.significantTerms(idx, "zzz", topN = 5).isEmpty)
  }

  test("significantTerms: tombstoned docs leave fg, bg, and totals") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a"), (4L, "c"))
      .toDF("doc_id", "text")
    val idx = Mutations.removeDocuments(
      IndexBuilder.build(df, "doc_id", Seq("text")), Seq(2L))
    // live corpus = {1, 3, 4}; match "b" = {1}; fg_n = 1, bg_n = 3
    //   b: (1/1)/(1/3) = 3     a: (1/1)/(2/3) = 3/2
    val got = QueryEngine.significantTerms(idx, "b", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(("b", 1L, 1L, 3.0), ("a", 1L, 2L, 1.5)))
  }

  test("dfsTopK == single-index top-k (both models, prefix + multi-term)") {
    val src = tools.SourceCodeGen.generate(spark, 600).cache()
    val full = IndexBuilder.build(src, "doc_id", Seq("content")).cached()
    val shards = Seq(0, 1, 2).map(r =>
      IndexBuilder.build(src.filter(col("doc_id") % 3 === r), "doc_id",
        Seq("content")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    for ((model, name) <- Seq((BM25(), "bm25"), (ZeroToOne(), "zto"));
         q <- Seq("import src", "pkg ident1", "ide")) {
      val want = rows(QueryEngine.query(full, q, model, limit = 25))
      val got = rows(ShardedSearch.dfsTopK(shards, q, model, k = 25))
      assert(got.map(_._1) == want.map(_._1), s"$name '$q' doc order")
      got.zip(want).foreach { case ((_, g), (_, w)) =>
        assert(math.abs(g - w) < 1e-9, s"$name '$q'") }
    }
    full.unpersist(); src.unpersist()
  }

  test("dfsTopK under shard tombstones == single index with same removals") {
    val src = tools.SourceCodeGen.generate(spark, 300).cache()
    val dead = (0L until 300L).filter(_ % 7 == 0)
    val full = Mutations.removeDocuments(
      IndexBuilder.build(src, "doc_id", Seq("content")), dead)
    // every shard gets the full removal list — absent ids tombstone nothing
    val shards = Seq(0, 1).map(r => Mutations.removeDocuments(
      IndexBuilder.build(src.filter(col("doc_id") % 2 === r), "doc_id",
        Seq("content")), dead))
    val want = QueryEngine.query(full, "import src", BM25(), limit = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = ShardedSearch.dfsTopK(shards, "import src", BM25(), k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == want.map(_._1))
    assert(got.map(_._1).intersect(dead).isEmpty && got.nonEmpty)
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-9) }
    src.unpersist()
  }

  test("dfsTopK over PERSISTED shard roots == single persisted build") {
    import graft.index.IndexCatalog
    val src = tools.SourceCodeGen.generate(spark, 300).cache()
    val base = java.nio.file.Files.createTempDirectory("dfs_roots").toString
    val roots = Seq(0, 1).map { r =>
      val root = s"$base/shard$r"
      IndexCatalog.build(src.filter(col("doc_id") % 2 === r), "doc_id",
        Seq("content"), root, nBuckets = 8)
      root
    }
    val fullRoot = s"$base/full"
    IndexCatalog.build(src, "doc_id", Seq("content"), fullRoot, nBuckets = 8)
    val want = QueryEngine.query(IndexCatalog.read(spark, fullRoot),
        "import src", graft.score.BM25(), limit = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = ShardedSearch.dfsTopK(
        roots.map(IndexCatalog.read(spark, _)), "import src",
        graft.score.BM25(), k = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == want.map(_._1) && got.nonEmpty)
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-9) }
    // tombstoned persisted shards: the global-dict recount keys by
    // (term, bucket) — parity must hold through the pruned scans
    val dead = (0L until 300L).filter(_ % 11 == 0)
    (roots :+ fullRoot).foreach(r =>
      IndexCatalog.removeDocuments(spark, r, dead))
    val want2 = QueryEngine.query(IndexCatalog.read(spark, fullRoot),
        "import src", graft.score.BM25(), limit = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got2 = ShardedSearch.dfsTopK(
        roots.map(IndexCatalog.read(spark, _)), "import src",
        graft.score.BM25(), k = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got2.map(_._1) == want2.map(_._1) && got2.nonEmpty)
    assert(got2.map(_._1).intersect(dead).isEmpty)
    got2.zip(want2).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-9) }
    src.unpersist()
  }

  test("gatherTopKWand: per-shard block-max == exhaustive gather == single") {
    import graft.index.IndexCatalog
    val src = tools.SourceCodeGen.generate(spark, 300).cache()
    val base = java.nio.file.Files.createTempDirectory("dfs_wand").toString
    val roots = Seq(0, 1).map { r =>
      val root = s"$base/s$r"
      IndexCatalog.build(src.filter(col("doc_id") % 2 === r), "doc_id",
        Seq("content"), root, nBuckets = 8)
      IndexCatalog.buildBlocks(spark, root, blockSize = 64,
        rangesPerGroup = 4)
      root
    }
    val shards = roots.map(IndexCatalog.read(spark, _))
    val blocks = roots.map(r => IndexCatalog.readBlocks(spark, r))
    val fullRoot = s"$base/full"
    IndexCatalog.build(src, "doc_id", Seq("content"), fullRoot, nBuckets = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    for (q <- Seq("import src", "ide")) {
      val want = rows(QueryEngine.query(IndexCatalog.read(spark, fullRoot),
        q, graft.score.BM25(), limit = 15))
      val wand = rows(ShardedSearch.gatherTopKWand(shards,
        blocks.map(_._1), q, graft.score.BM25(), k = 15,
        blockSize = blocks.head._2, rangesPerGroup = blocks.head._3))
      assert(wand.map(_._1) == want.map(_._1) && wand.nonEmpty, s"'$q'")
      wand.zip(want).foreach { case ((_, g), (_, w)) =>
        assert(math.abs(g - w) < 1e-9, s"'$q'") }
    }
    // tombstoned shards are refused loudly
    IndexCatalog.removeDocuments(spark, roots.head, Seq(2L))
    val t = roots.map(IndexCatalog.read(spark, _))
    intercept[IllegalArgumentException](
      ShardedSearch.gatherTopKWand(t, blocks.map(_._1), "import",
        graft.score.BM25(), k = 5, blockSize = blocks.head._2))
    src.unpersist()
  }

  test("dfsTopK degenerate shapes: one shard == plain query; bad args loud") {
    val src = tools.SourceCodeGen.generate(spark, 120).cache()
    val idx = IndexBuilder.build(src, "doc_id", Seq("content"))
    val want = QueryEngine.query(idx, "import", BM25(), limit = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = ShardedSearch.dfsTopK(Seq(idx), "import", BM25(), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-9) }
    intercept[IllegalArgumentException](
      ShardedSearch.dfsTopK(Nil, "import", BM25(), k = 10))
    intercept[IllegalArgumentException](
      ShardedSearch.dfsTopK(Seq(idx), "import", BM25(), k = 0))
    src.unpersist()
  }
}
