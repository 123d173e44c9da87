package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.index.IndexBuilder
import graft.query.QueryEngine
import graft.score.BM25

/** Property fuzz for the bool-query clause ALGEBRA
  * ([[QueryEngine.boolQuery]]): on random corpora and random clause
  * strings, the result doc SET must equal the first-principles set
  * (every must prefix matched AND any scored prefix matched AND no
  * mustNot prefix matched), and each score must equal the plain
  * disjunctive query's score for that doc (clauses restrict, never
  * rescore). Scoring itself is pinned by the golden/WAND suites; this
  * fuzzes the composition, where the new code lives.
  */
object BoolProps extends Properties("Bool") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(1337L))

  private lazy val spark = TestSpark.spark

  private val vocab = Vector("a", "ab", "abc", "b", "ba", "bc", "c", "ca",
    "d", "e")
  private val docGen: Gen[String] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
      .map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.choose(4, 25).flatMap(n => Gen.listOfN(n, docGen))
  private def clauseGen(maxTerms: Int): Gen[String] =
    Gen.choose(0, maxTerms)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab ++ Seq("x", "abz"))))
      .map(_.mkString(" "))

  private def toks(s: String): Seq[String] =
    s.split("\\s+").filter(_.nonEmpty).toSeq

  property("clause algebra == first-principles sets; scores untouched") =
    forAll(corpusGen, clauseGen(2), clauseGen(2), clauseGen(1)) {
      (docs, must, should, mustNot) =>
        val mustT = toks(must); val shouldT = toks(should)
        (mustT.nonEmpty || shouldT.nonEmpty) ==> {
          import spark.implicits._
          val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("id", "title")
          val idx = IndexBuilder.build(df, "id", Seq("title"))
          val corpus = docs.zipWithIndex
            .map { case (t, i) => (i.toLong, toks(t)) }
          def matches(dts: Seq[String], q: String) =
            dts.exists(_.startsWith(q))
          val wantSet = corpus.collect { case (id, dts)
            if mustT.forall(matches(dts, _)) &&
              (mustT ++ shouldT).exists(matches(dts, _)) &&
              !toks(mustNot).exists(matches(dts, _)) => id
          }.toSet
          val got = QueryEngine.boolQuery(idx, BM25(), must, should, mustNot)
            .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
          val plain = QueryEngine.query(idx,
              (mustT ++ shouldT).mkString(" "), BM25())
            .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
          got.keySet == wantSet &&
            got.forall { case (id, s) => math.abs(s - plain(id)) < 1e-12 }
        }
    }
}
