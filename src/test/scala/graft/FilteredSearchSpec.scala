package graft

import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, Mutations, PostingBlocks, VectorIndex}
import graft.pipeline.Similarity
import graft.query.{BlockMaxTopK, QueryEngine}
import graft.score.{BM25, ZeroToOne}
import graft.tools.{SourceCodeGen, VectorFixtures}

/** Filtered search: predicate + top-k with CORPUS-level stats.
  *
  * The load-bearing invariant: because stats (idf, avgdl, df) stay
  * corpus-level, a doc's score is independent of the filter — so the
  * filtered result must equal the unfiltered result restricted to the
  * allowed set, on EVERY path (exhaustive, WAND incl. the θ-probe and the
  * cost-based bail, fuzzy). Any drift (filter applied to stats, filter
  * missed on one path, θ seeded by a disallowed doc) breaks these tests.
  */
class FilteredSearchSpec extends TestBase {

  private def results(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("filtered exhaustive == unfiltered restricted to the allowed set (BM25 + zto)") {
    import spark.implicits._
    val src = SourceCodeGen.generate(spark, 1000)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val allowed = src.filter(col("doc_id") % 3 === 0).select(col("doc_id"))
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    for (model <- Seq(BM25(), ZeroToOne())) {
      val unf = results(QueryEngine.query(idx, "import ident1", model))
      val fil = results(QueryEngine.query(idx, "import ident1", model,
        docFilter = Some(allowed)))
      assert(fil == unf.filter { case (id, _) => allowedSet(id) },
        s"filtered != restricted unfiltered for $model")
      assert(fil.nonEmpty)
    }
    idx.unpersist()
  }

  test("filtered WAND == filtered exhaustive (θ from allowed docs only)") {
    import spark.implicits._
    val src = SourceCodeGen.generate(spark, 1500)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val blocks = PostingBlocks.fromPostings(idx.postings, 2, blockSize = 128).cache()
    val allowed = src.filter(col("doc_id") % 4 === 1).select(col("doc_id"))
    for (q <- Seq("import", "ident7 val", "Modu")) {
      val exact = results(QueryEngine.query(idx, q, BM25(), limit = 10,
        docFilter = Some(allowed)))
      val wand = results(BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10,
        blockSize = 128, docFilter = Some(allowed)))
      assert(wand == exact, s"filtered WAND mismatch for '$q'")
    }
    idx.unpersist(); blocks.unpersist()
  }

  test("filtered WAND under tombstones: deleted docs AND disallowed docs both excluded") {
    import spark.implicits._
    val src = SourceCodeGen.generate(spark, 800)
    val idx0 = IndexBuilder.build(src, "doc_id", Seq("content", "path"))
    val idx = Mutations.removeDocuments(idx0, (0L until 50L)).cached()
    val blocks = PostingBlocks.fromPostings(idx0.postings, 2, blockSize = 128).cache()
    val allowed = src.filter(col("doc_id") % 2 === 0).select(col("doc_id"))
    val exact = results(QueryEngine.query(idx, "import", BM25(), limit = 10,
      docFilter = Some(allowed)))
    val wand = results(BlockMaxTopK.query(idx, blocks, "import", BM25(), k = 10,
      blockSize = 128, docFilter = Some(allowed)))
    assert(wand == exact && exact.nonEmpty)
    assert(exact.forall { case (id, _) => id % 2 == 0 && id >= 50 })
    idx.unpersist(); blocks.unpersist()
  }

  test("fuzzy filtered == fuzzy unfiltered restricted") {
    import spark.implicits._
    val src = SourceCodeGen.generate(spark, 600)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val allowed = src.filter(col("doc_id") % 2 === 0).select(col("doc_id"))
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    // "imprt" is ONE deletion from "import" — inside the maxEdits=1 window
    // (a transposition like "improt" costs 2 and would make this vacuous)
    val unf = results(QueryEngine.query(idx, "imprt", BM25(), maxEdits = 1))
    val fil = results(QueryEngine.query(idx, "imprt", BM25(), maxEdits = 1,
      docFilter = Some(allowed)))
    assert(fil == unf.filter { case (id, _) => allowedSet(id) } && fil.nonEmpty)
    idx.unpersist()
  }

  test("empty filter set yields an empty result on both paths") {
    import spark.implicits._
    val src = SourceCodeGen.generate(spark, 300)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val blocks = PostingBlocks.fromPostings(idx.postings, 2, blockSize = 128).cache()
    val none = Some(Seq.empty[Long].toDF("doc_id"))
    assert(QueryEngine.query(idx, "import", BM25(), docFilter = none).isEmpty)
    assert(BlockMaxTopK.query(idx, blocks, "import", BM25(), k = 5,
      blockSize = 128, docFilter = none).isEmpty)
    idx.unpersist(); blocks.unpersist()
  }

  test("conjunctive = disjunctive restricted to the per-term result intersection") {
    import spark.implicits._
    val src = SourceCodeGen.generate(spark, 800)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    // ground truth from first principles: docs present in BOTH single-term
    // result sets (each term queried alone), an independent formulation
    val a = results(QueryEngine.query(idx, "import", BM25())).map(_._1).toSet
    val b = results(QueryEngine.query(idx, "ident1", BM25())).map(_._1).toSet
    val both = a intersect b
    val filter = QueryEngine.conjunctiveFilter(idx, "import ident1")
    assert(filter.collect().map(_.getLong(0)).toSet == both)
    val disj = results(QueryEngine.query(idx, "import ident1", BM25()))
    val conj = results(QueryEngine.query(idx, "import ident1", BM25(),
      docFilter = Some(filter)))
    assert(conj == disj.filter { case (id, _) => both(id) } && conj.nonEmpty)
    // strict AND: a term with no live expansion empties the result
    assert(QueryEngine.conjunctiveFilter(idx, "import zzznope").isEmpty)
    idx.unpersist()
  }

  test("conjunctive WAND == conjunctive exhaustive") {
    val src = SourceCodeGen.generate(spark, 1200)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val blocks = PostingBlocks.fromPostings(idx.postings, 2, blockSize = 128).cache()
    for (q <- Seq("import ident1", "Modu val")) {
      val f = QueryEngine.conjunctiveFilter(idx, q)
      val exact = results(QueryEngine.query(idx, q, BM25(), limit = 10,
        docFilter = Some(f)))
      val wand = results(BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10,
        blockSize = 128, docFilter = Some(f)))
      assert(wand == exact && exact.nonEmpty, s"conjunctive WAND mismatch '$q'")
    }
    idx.unpersist(); blocks.unpersist()
  }

  test("exclusion (NOT) = match-set difference; composes through both paths") {
    val src = SourceCodeGen.generate(spark, 900)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val blocks = PostingBlocks.fromPostings(idx.postings, 2, blockSize = 128).cache()
    // ground truth from first principles: docs in the query's result set
    // but NOT in the exclusion query's (each queried alone)
    val m = results(QueryEngine.query(idx, "import ident1", BM25())).map(_._1).toSet
    val x = results(QueryEngine.query(idx, "val", BM25())).map(_._1).toSet
    val want = m diff x
    val f = QueryEngine.exclusionFilter(idx, "import ident1", "val")
    assert(f.collect().map(_.getLong(0)).toSet == want && want.nonEmpty)
    assert(x.exists(m), "exclusion must bind (some doc matches both)")
    val disj = results(QueryEngine.query(idx, "import ident1", BM25()))
    val not = results(QueryEngine.query(idx, "import ident1", BM25(),
      docFilter = Some(f)))
    assert(not == disj.filter { case (id, _) => want(id) } && not.nonEmpty)
    val wand = results(BlockMaxTopK.query(idx, blocks, "import ident1", BM25(),
      k = 10, blockSize = 128, docFilter = Some(f)))
    val exact = results(QueryEngine.query(idx, "import ident1", BM25(),
      limit = 10, docFilter = Some(f)))
    assert(wand == exact, "NOT through WAND != NOT through exhaustive")
    // NOT of an unmatched exclusion query is a no-op
    val noop = QueryEngine.exclusionFilter(idx, "import ident1", "zzznope")
    assert(noop.collect().map(_.getLong(0)).toSet == m)
    idx.unpersist(); blocks.unpersist()
  }

  test("filtered ANN == unfiltered probe candidates restricted (persisted index)") {
    import spark.implicits._
    val root = s"/tmp/graft_test_filtered_ann_${System.nanoTime()}"
    val emb = VectorFixtures.uniform(spark, n = 400, dim = 16, seed = 11)
    VectorIndex.build(emb, "vec_id", "embedding", dim = 16, nBits = 6, root)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val allowed = emb.filter(col("vec_id") % 2 === 1).select(col("vec_id"))
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    val unf = VectorIndex.probeCandidates(spark, root, q).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fil = VectorIndex.annTopK(spark, root, q, k = 10,
      filter = Some(allowed)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = unf.filter { case (id, _) => allowedSet(id) }
      .sortBy { case (id, c) => (-c, id) }.take(10)
    assert(fil == want && fil.nonEmpty)
  }
}
