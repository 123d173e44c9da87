package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.index.{IndexBuilder, IndexCatalog}
import graft.query.QueryEngine
import graft.score.BM25

/** Random-walk fuzz of the PERSISTED index lifecycle: any interleaving of
  * append / crashed-append / remove / vacuum must end at an index whose
  * query results match a one-shot in-memory build over the net corpus
  * (adds minus removes), and — after a closing vacuum — whose termdict and
  * stats match exactly. Exercises the generation-dir publish, the
  * vacuum.pending commit, and resume ordering under composition (the
  * pairwise cases live in IncrementalSpec; this walks them together).
  */
object LifecycleProps extends Properties("Lifecycle") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)
      .withInitialSeed(org.scalacheck.rng.Seed(23L))

  private lazy val spark = TestSpark.spark

  private val vocab = Vector("a", "ab", "abc", "b", "ba", "c", "ca", "d")
  private val docGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
      .map(_.mkString(" "))

  sealed trait Op
  case class Append(crash: Boolean) extends Op
  case class Remove(pick: Int) extends Op
  /** crash = die AFTER the stage rewrites, BEFORE the final commit — the
    * vacuum.pending state every later writer must complete first.
    */
  case class Vacuum(crash: Boolean) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.oneOf(true, false).map(Append(_)),
    3 -> Gen.choose(0, Int.MaxValue).map(Remove(_)),
    2 -> Gen.oneOf(true, false).map(Vacuum(_)))

  private val caseGen = for {
    n <- Gen.choose(8, 16)
    docs <- Gen.listOfN(n, docGen)
    nOps <- Gen.choose(2, 4)
    ops <- Gen.listOfN(nOps, opGen)
  } yield (docs, ops)

  property("random walk of append/crash/remove/vacuum == build(net corpus)") =
    forAll(caseGen) { case (docs, ops) =>
      import spark.implicits._
      def df(r: Seq[(Long, String)]) = r.toDF("id", "title")
      val rows = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val root = java.nio.file.Files
        .createTempDirectory("graft_life_").toString

      // initial build over a prefix; remaining docs are split across the
      // Append ops in order
      val nAppends = math.max(1, ops.count(_.isInstanceOf[Append]))
      val cut = math.max(1, rows.size / (nAppends + 1))
      var pending = rows.drop(cut)
      var live = rows.take(cut).toMap
      IndexCatalog.build(df(rows.take(cut)), "id", Seq("title"), root, nBuckets = 4)

      ops.foreach {
        case Append(crash) =>
          val batch = pending.take(math.max(1, pending.size / 2))
          pending = pending.drop(batch.size)
          if (batch.nonEmpty) {
            // a crashed (staged-only) append models a process death AFTER
            // stage-commit; the next writer always resumes first — exactly
            // what the public addDocuments does — so land any predecessor
            // before staging the next crash
            if (crash) {
              IndexCatalog.resumeAppend(spark, root)
              IndexCatalog.stageAppend(df(batch), "id", root)
              ()
            } else IndexCatalog.addDocuments(df(batch), "id", root)
            // staged-but-unpublished appends still count toward the net
            // corpus: the NEXT write op (or final resume) must land them
            live = live ++ batch
          }
        case Remove(pick) =>
          if (live.nonEmpty) {
            val ids = live.keys.toSeq.sorted
            val id = ids(pick % ids.size)
            IndexCatalog.removeDocuments(spark, root, Seq(id))
            live = live - id
          }
        case Vacuum(crash) =>
          IndexCatalog.vacuum(spark, root, crashBeforeCommit = crash)
      }
      IndexCatalog.resumeAppend(spark, root) // land any trailing crash
      val got = IndexCatalog.read(spark, root)
      val want = IndexBuilder.build(df(live.toSeq.sortBy(_._1)), "id", Seq("title"))

      val q = "a b c" // prefix-expands over most of the vocabulary
      def res(idx: graft.index.InvertedIndex) =
        QueryEngine.query(idx, q, BM25()).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val queriesOk = res(got) == res(want)

      // closing vacuum: all tombstones purged → exact table equality
      IndexCatalog.vacuum(spark, root)
      val gotV = IndexCatalog.read(spark, root)
      val dictOk =
        gotV.termdict.select("term", "df").exceptAll(want.termdict).count() == 0 &&
          want.termdict.exceptAll(gotV.termdict.select("term", "df")).count() == 0
      val sa = gotV.fieldStats(); val sb = want.fieldStats()
      val statsOk = sa.n == sb.n && sa.sums.toSeq == sb.sums.toSeq

      queriesOk && dictOk && statsOk && res(gotV) == res(want)
    }
}
