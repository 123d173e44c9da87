package graft

import graft.index.IndexBuilder
import graft.query.QueryEngine
import graft.score.BM25
import graft.tools.SourceCodeGen

/** Synonym expansion: variants share their query-term slot, so the score
  * must be Σ_slots max_variants — never a sum over variants. Ground truth
  * is assembled driver-side from independent single-term queries, so a
  * double-count (sum instead of max), a dropped variant, or a variant
  * scored under the wrong slot all break the arithmetic.
  */
class SynonymSpec extends TestBase {

  private def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap

  test("synonym score == Σ_slots max_variants, assembled from single-term queries") {
    val src = SourceCodeGen.generate(spark, 700)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val a = scores(QueryEngine.query(idx, "import", BM25()))
    val b = scores(QueryEngine.query(idx, "ident1", BM25()))
    val c = scores(QueryEngine.query(idx, "ident2", BM25()))
    // "import X" where X matches ident1 OR ident2 (slot 1)
    val got = scores(QueryEngine.synonymQuery(idx, "import ident1",
      Map("ident1" -> Seq("ident2")), BM25()))
    val ids = a.keySet ++ b.keySet ++ c.keySet
    val want = ids.flatMap { id =>
      val s = a.getOrElse(id, 0.0) +
        math.max(b.getOrElse(id, 0.0), c.getOrElse(id, 0.0))
      if (s > 0) Some(id -> s) else None
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-12, s"doc $id: $s != ${want(id)}")
    }
    // the synonym must BIND: the variant wins slot 1 for some doc (so a
    // dropped variant would change that doc's score)
    assert(ids.exists(id => c.getOrElse(id, 0.0) > b.getOrElse(id, 0.0)))
    // and overlap docs exist, so max-vs-sum is actually exercised
    assert((b.keySet intersect c.keySet).nonEmpty)
    idx.unpersist()
  }

  test("empty synonym map degenerates to query(); absent variants no-op") {
    val src = SourceCodeGen.generate(spark, 500)
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val plain = scores(QueryEngine.query(idx, "import ident1", BM25()))
    assert(scores(QueryEngine.synonymQuery(idx, "import ident1",
      Map.empty, BM25())) == plain)
    assert(scores(QueryEngine.synonymQuery(idx, "import ident1",
      Map("ident1" -> Seq("zzznope")), BM25())) == plain)
    idx.unpersist()
  }
}
