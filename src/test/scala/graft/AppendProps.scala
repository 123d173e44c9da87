package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.index.{IndexBuilder, IndexCatalog}
import graft.query.QueryEngine
import graft.score.BM25

/** Property fuzz for the incremental-append protocol: any way of slicing a
  * corpus into build + append batches — with a crash (staged, unpublished)
  * before any batch — must end at an index indistinguishable from a single
  * build over the union: same BM25 results, same termdict, same stats.
  */
object AppendProps extends Properties("Append") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))

  private lazy val spark = TestSpark.spark

  private val vocab = Vector("a", "ab", "abc", "b", "ba", "c", "ca", "d")
  private val docGen: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
      .map(_.mkString(" "))

  // corpus + a cut point + per-batch crash flags
  private val caseGen = for {
    n <- Gen.choose(6, 20)
    docs <- Gen.listOfN(n, docGen)
    cut <- Gen.choose(1, n - 1)
    crashMid <- Gen.oneOf(true, false)
  } yield (docs, cut, crashMid)

  property("splice(build, append[, crash]) == build(union)") =
    forAll(caseGen) { case (docs, cut, crashMid) =>
      import spark.implicits._
      val rows = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      def df(r: Seq[(Long, String)]) = r.toDF("id", "title")
      val root = java.nio.file.Files
        .createTempDirectory("graft_append_prop_").toString
      IndexCatalog.build(df(rows.take(cut)), "id", Seq("title"), root, nBuckets = 4)
      if (crashMid) {
        // crash: stage the delta but never publish; the next addDocuments
        // (or resumeAppend) must finish it before doing its own work
        IndexCatalog.stageAppend(df(rows.drop(cut)), "id", root)
        IndexCatalog.resumeAppend(spark, root)
      } else {
        IndexCatalog.addDocuments(df(rows.drop(cut)), "id", root)
      }
      val got = IndexCatalog.read(spark, root)
      val want = IndexBuilder.build(df(rows), "id", Seq("title"))

      val q = "a b c" // prefix-expands over most of the vocabulary
      val a = QueryEngine.query(got, q, BM25()).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = QueryEngine.query(want, q, BM25()).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val gotDict = got.termdict.select("term", "df")
      val wantDict = want.termdict.select("term", "df")
      // BOTH directions: a term lost by the append (outside the query's
      // expansion sets) must fail the property too
      val dictOk = gotDict.exceptAll(wantDict).count() == 0 &&
        wantDict.exceptAll(gotDict).count() == 0
      val sa = got.fieldStats(); val sb = want.fieldStats()
      a == b && dictOk && sa.n == sb.n && sa.sums.toSeq == sb.sums.toSeq
    }
}
