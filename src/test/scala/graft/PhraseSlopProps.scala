package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.index.IndexBuilder
import graft.query.QueryEngine

/** Property fuzz for sloppy-phrase semantics
  * ([[QueryEngine.phraseFilter]] with `slop > 0`): on random corpora,
  * random 2–3-term phrases, and random slop, the match set must equal a
  * first-principles per-gap window scan over the tokenized docs. The
  * vocabulary deliberately includes regex metacharacters (".", "*", "(",
  * "[", "+") as literal token content — an escaping bug in the verify
  * pattern shows up as a spurious match here.
  */
object PhraseSlopProps extends Properties("PhraseSlop") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(4242L))

  private lazy val spark = TestSpark.spark

  private val vocab = Vector("a", "b", "c", "a.b", "c*", "(d", "[e", "f+", "g")
  private val docGen: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
      .map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.choose(4, 25).flatMap(n => Gen.listOfN(n, docGen))
  private val phraseGen: Gen[List[String]] =
    Gen.choose(2, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))

  /** per-gap ordered proximity: terms appear in order with ≤ slop
    * intervening tokens between each ADJACENT pair
    */
  private def truth(toks: IndexedSeq[String], phrase: List[String],
      slop: Int): Boolean = {
    def from(i: Int, rest: List[String]): Boolean = rest match {
      case Nil => true
      case t :: tail =>
        (i + 1 to math.min(toks.length - 1, i + 1 + slop)).exists(j =>
          toks(j) == t && from(j, tail))
    }
    toks.indices.exists(i => toks(i) == phrase.head && from(i, phrase.tail))
  }

  property("slop match set == per-gap window scan (metachar vocab)") =
    forAll(corpusGen, phraseGen, Gen.choose(0, 3)) { (docs, phrase, slop) =>
      (phrase.nonEmpty) ==> {
        import spark.implicits._
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val idx = IndexBuilder.build(df, "doc_id", Seq("text"))
        val want = docs.zipWithIndex.collect { case (t, i)
          if truth(t.split(" ").filter(_.nonEmpty).toIndexedSeq, phrase,
            slop) => i.toLong
        }.toSet
        val got = QueryEngine.phraseFilter(idx, df, "doc_id", Seq("text"),
            phrase.mkString(" "), slop = slop)
          .collect().map(_.getLong(0)).toSet
        got == want
      }
    }
}
