package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.index.{IndexBuilder, PostingBlocks}
import graft.query.{BlockMaxTopK, QueryEngine}
import graft.score.{BM25, ScoreModel, ZeroToOne}

/** Property fuzz for the single most semantics-dense custom algorithm:
  * block-max WAND must return EXACTLY the exhaustive top-k — same docs,
  * same scores, same order — on random corpora, random (partially
  * non-matching, prefix-heavy) queries, and random k. blockSize=8 forces
  * many blocks per term; probeBlocks=2 keeps the θ seed partial so the
  * pruning phase actually prunes.
  */
object WandParityProps extends Properties("WandParity") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)) // deterministic CI run

  private lazy val spark = TestSpark.spark

  // prefix-nested vocabulary so queries genuinely expand
  private val vocab = Vector("a", "ab", "abc", "abd", "b", "ba", "bab",
    "bc", "c", "ca", "cab", "d", "da", "e")
  private val docGen: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
      .map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.choose(4, 30).flatMap(n => Gen.listOfN(n, docGen))
  private val queryGen: Gen[String] =
    Gen.choose(1, 3)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab ++ Seq("x", "abcz"))))
      .map(_.mkString(" "))

  private def parity(docs: List[String], q: String, k: Int,
      model: ScoreModel): Boolean = {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "title")
    val idx = IndexBuilder.build(df, "id", Seq("title"))
    val blocks = PostingBlocks.fromPostings(idx.postings, 1, blockSize = 8)
    val exact = QueryEngine.query(idx, q, model, limit = k).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val wand = BlockMaxTopK.query(idx, blocks, q, model, k = k,
      blockSize = 8, probeBlocks = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    wand == exact
  }

  property("blockMax top-k == exhaustive top-k (BM25)") =
    forAll(corpusGen, queryGen, Gen.choose(1, 8)) { (docs, q, k) =>
      parity(docs, q, k, BM25())
    }

  property("blockMax top-k == exhaustive top-k (zero-to-one)") =
    forAll(corpusGen, queryGen, Gen.choose(1, 8)) { (docs, q, k) =>
      parity(docs, q, k, ZeroToOne())
    }

  /** Tombstones must NOT silently fall back to exhaustive (round-3 engine
    * did): blocks are built BEFORE the delete — the deployment state
    * between a remove and the next vacuum, where block metadata covers a
    * superset of the live entries — and pruning must stay live (df
    * recounted, candidates anti-joined) while returning exactly the
    * exhaustive live top-k.
    */
  private def parityTombstoned(docs: List[String], q: String, k: Int,
      mod: Int, model: ScoreModel): Boolean = {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "title")
    val idx0 = IndexBuilder.build(df, "id", Seq("title"))
    val blocks = PostingBlocks.fromPostings(idx0.postings, 1, blockSize = 8)
    val ids = docs.indices.collect { case i if i % mod == 0 => i.toLong }
    val idx = graft.index.Mutations.removeDocuments(idx0, ids)
    val exact = QueryEngine.query(idx, q, model, limit = k).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val wand = BlockMaxTopK.query(idx, blocks, q, model, k = k,
      blockSize = 8, probeBlocks = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val stats = BlockMaxTopK.pruningStats(idx, blocks, q, model, k = k,
      blockSize = 8, probeBlocks = 2)
    // parity AND no silent fallback (stats is None only when nothing
    // expands / no live posting remains, i.e. the exact result is empty)
    wand == exact && (stats.isDefined || exact.isEmpty)
  }

  /** The per-field boost enters the block bound multiplicatively
    * (tfn(maxTf,minFl)·boost per field); random POSITIVE boosts over a
    * 2-field corpus pin that the bound stays dominating for any boost
    * vector the engine accepts on this path (negative boosts fall back —
    * BlockMaxSpec).
    */
  property("blockMax == exhaustive with random positive boosts (2 fields)") =
    forAll(corpusGen, corpusGen, queryGen, Gen.choose(1, 8),
      Gen.choose(1, 30), Gen.choose(1, 30)) { (t1, t2, q, k, b1, b2) =>
      import spark.implicits._
      val n = math.max(t1.size, t2.size)
      val df = (0 until n).map(i =>
        (i.toLong, t1.lift(i).getOrElse(""), t2.lift(i).getOrElse("")))
        .toDF("id", "title", "body")
      val idx = IndexBuilder.build(df, "id", Seq("title", "body"))
      val blocks = PostingBlocks.fromPostings(idx.postings, 2, blockSize = 8)
      val boosts = Seq(b1 / 10.0, b2 / 10.0)
      val exact = QueryEngine.query(idx, q, BM25(), boosts = boosts, limit = k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val wand = BlockMaxTopK.query(idx, blocks, q, BM25(), boosts = boosts,
        k = k, blockSize = 8, probeBlocks = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      wand == exact
    }

  /** Adaptive θ probe (round-4 verdict #7): with probeBlocks=1 a static
    * probe covers only one 8-doc range — for any k > 8 its θ would be -inf
    * and NOTHING would prune (the old behavior). The probe must extend
    * itself along the UB-ordered prefix until the block `cnt` metadata
    * guarantees ≥ k candidate docs, seed a real θ, and still prune the
    * cold ranges — while returning exactly the exhaustive top-k.
    */
  property("adaptive probe: k beyond the static probe coverage still prunes") =
    forAll(Gen.choose(10, 24), Gen.choose(0, 8)) { (k, extraHot) =>
      import spark.implicits._
      val nHot = k + extraHot // enough identically-hot docs to fill top-k
      val docs = (0L until 256L).map { i =>
        val toks =
          if (i < nHot) Seq.fill(10)("hot") ++ Seq.fill(2)("pad")
          else "hot" +: Seq.fill(11)("pad") // fl constant across corpus
        (i, toks.mkString(" "))
      }
      val idx = IndexBuilder.build(docs.toDF("id", "title"), "id", Seq("title"))
      val blocks = PostingBlocks.fromPostings(idx.postings, 1, blockSize = 8)
      val Some((total, survive, theta)) = BlockMaxTopK.pruningStats(
        idx, blocks, "hot", BM25(), k = k, blockSize = 8, probeBlocks = 1)
      val exact = QueryEngine.query(idx, "hot", BM25(), limit = k).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val wand = BlockMaxTopK.query(idx, blocks, "hot", BM25(), k = k,
        blockSize = 8, probeBlocks = 1).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      theta > 0 && survive < total && wand == exact && exact.size == k
    }

  property("blockMax == exhaustive under tombstones, pruning live (BM25)") =
    forAll(corpusGen, queryGen, Gen.choose(1, 8), Gen.choose(2, 4)) {
      (docs, q, k, mod) => parityTombstoned(docs, q, k, mod, BM25())
    }

  property("blockMax == exhaustive under tombstones, pruning live (zto)") =
    forAll(corpusGen, queryGen, Gen.choose(1, 8), Gen.choose(2, 4)) {
      (docs, q, k, mod) => parityTombstoned(docs, q, k, mod, ZeroToOne())
    }
}
