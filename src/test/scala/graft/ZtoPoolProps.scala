package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.score.{ZEntry, ZeroToOne}

/** The q35 oracle's closed-form reduction of the zero-to-one greedy pool
  * loop for 2-query-term queries, fuzz-pinned against the REAL loop
  * ([[ZeroToOne.fieldScore]], itself pinned to the reference by
  * GoldenZeroToOneSpec): sort by (score desc, qti asc, node asc); the first
  * entry consumes; the second consumed entry is the first other-qti entry
  * whose node differs from the first's, or shares it with tf ≥ 2.
  *
  * The generator deliberately produces OVERLAPPING expansion sets (shared
  * nodes between the two query terms — the same (doc,field,node) posting,
  * hence equal tf), score ties, and tf=1 pool-exhaustion cases.
  */
object ZtoPoolProps extends Properties("ZtoPool") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(400)
      .withInitialSeed(org.scalacheck.rng.Seed(11L))

  /** The 2-term closed form (mirrors the q35 oracle SQL exactly). */
  private def reduced(entries: IndexedSeq[ZEntry], qlen: Int): Double = {
    def contrib(e: ZEntry): Double =
      math.min(e.score / e.tf.toDouble, 1.0) * e.tf.toDouble /
        math.max(e.fl, qlen).toDouble
    val sorted = entries.sortBy(e => (-e.score, e.qti, e.node))
    sorted.headOption.fold(0.0) { e1 =>
      val e2 = sorted.tail.find(e =>
        e.qti != e1.qti && (e.node != e1.node || e.tf >= 2))
      contrib(e1) + e2.fold(0.0)(contrib)
    }
  }

  private val nodes = Vector("n1", "n2", "n3", "spark")

  // per (doc,field): one fl (≥ every tf, as in real postings); per node:
  // one tf shared across qti (same posting); per (qti, node): at most one
  // entry, scores from a collision-prone grid so ties exercise the tiebreak
  private val scoreGrid = Gen.oneOf(0.25, 0.5, 0.75, 1.0)
  private val groupGen: Gen[IndexedSeq[ZEntry]] = for {
    flBase <- Gen.choose(1, 12)
    tfs <- Gen.listOfN(nodes.size, Gen.choose(1, 4))
    p0s <- Gen.listOfN(nodes.size, Gen.oneOf(true, false))
    p1s <- Gen.listOfN(nodes.size, Gen.oneOf(true, false))
    s0s <- Gen.listOfN(nodes.size, scoreGrid)
    s1s <- Gen.listOfN(nodes.size, scoreGrid)
  } yield {
    val fl = math.max(flBase, tfs.max)
    nodes.indices.flatMap { i =>
      Seq(
        if (p0s(i)) Some(ZEntry(0L, 0, s0s(i), 0, nodes(i), tfs(i), fl)) else None,
        if (p1s(i)) Some(ZEntry(0L, 0, s1s(i), 1, nodes(i), tfs(i), fl)) else None
      ).flatten
    }.toIndexedSeq
  }

  property("closed form == reference greedy loop (qlen = 2)") =
    forAll(groupGen) { entries =>
      val a = ZeroToOne.fieldScore(entries, 2)
      val b = reduced(entries, 2)
      // same consumed entries in the same order ⇒ bit-identical doubles
      a == b
    }
}
