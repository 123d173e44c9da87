package graft

import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, PostingBlocks}
import graft.query.{BlockMaxTopK, QueryEngine}
import graft.score.BM25

/** Dis-max field combination (`BM25(tieBreaker = Some(t))`): ground truth
  * is a full driver-side replay of the per-field BM25 parts, never the
  * engine; WAND parity pins that the UNCHANGED Σ-shaped block bound stays
  * sound under the (≤ Σ) dis-max combine.
  */
class DisMaxSpec extends TestBase {

  test("tieBreaker == driver replay; 1.0 ≈ field sum; 0.0 = best field") {
    import spark.implicits._
    val data = Seq(
      (1L, "a a b", "a c"),
      (2L, "b c", "a a a"),
      (3L, "a", "x y"))
    val df = data.toDF("doc_id", "f1", "f2")
    val idx = IndexBuilder.build(df, "doc_id", Seq("f1", "f2"))
    val boosts = Seq(1.0, 2.0)

    // driver replay for the single exact query term 'a'
    val toks = data.map { case (id, a, b) =>
      (id, a.split("\\s+").filter(_.nonEmpty).toSeq,
        b.split("\\s+").filter(_.nonEmpty).toSeq)
    }
    val n = toks.length.toDouble
    val avg1 = toks.map(_._2.length).sum / n
    val avg2 = toks.map(_._3.length).sum / n
    val dfOcc = toks.map(t => t._2.count(_ == "a") + t._3.count(_ == "a")).sum
    val f = math.min(n, dfOcc.toDouble)
    val idf = math.log(1.0 + (n - f + 0.5) / (f + 0.5))
    def part(tf: Int, fl: Int, avg: Double, boost: Double): Double =
      if (tf <= 0) 0.0
      else (2.2 * tf) / (1.2 * (0.25 + 0.75 * (fl / avg)) + tf) * idf * boost
    def want(t: Double): Map[Long, Double] = toks.flatMap { case (id, a, b) =>
      val p1 = part(a.count(_ == "a"), a.length, avg1, boosts.head)
      val p2 = part(b.count(_ == "a"), b.length, avg2, boosts(1))
      val best = math.max(p1, p2)
      val s = best + t * ((p1 + p2) - best)
      if (s > 0) Some(id -> s) else None
    }.toMap

    for (t <- Seq(0.0, 0.3, 1.0)) {
      val got = QueryEngine.query(idx, "a", BM25(tieBreaker = Some(t)),
          boosts = boosts)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == want(t).keySet, s"t=$t doc set")
      got.foreach { case (id, s) =>
        assert(math.abs(s - want(t)(id)) < 1e-9, s"t=$t doc $id: $s") }
    }
    // t = 1 is the field sum: identical doc set, scores ≈ the default model
    val sum = QueryEngine.query(idx, "a", BM25(), boosts = boosts)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val t1 = QueryEngine.query(idx, "a", BM25(tieBreaker = Some(1.0)),
        boosts = boosts)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(t1.keySet == sum.keySet)
    t1.foreach { case (id, s) => assert(math.abs(s - sum(id)) < 1e-9) }
    // invalid tie-breakers are rejected loudly
    intercept[IllegalArgumentException](BM25(tieBreaker = Some(1.5)))
    intercept[IllegalArgumentException](BM25(tieBreaker = Some(-0.1)))
  }

  test("WAND parity under dis-max: Σ block bound dominates the ≤-Σ combine") {
    val src = tools.SourceCodeGen.generate(spark, 600).cache()
    val idx = IndexBuilder.build(src, "doc_id", Seq("content", "path")).cached()
    val blocks = PostingBlocks.fromPostings(idx.postings, 2, 64L).cache()
    val model = BM25(tieBreaker = Some(0.3))
    val boosts = Seq(1.0, 1.5)
    for (q <- Seq("import src", "pkg ident1")) {
      val exhaustive = QueryEngine.query(idx, q, model, boosts = boosts)
        .select(col("doc_id"),
          round(col("score") * lit(1e6)).cast("long").as("sm"))
        .orderBy(col("sm").desc, col("doc_id").asc).limit(20)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val wand = BlockMaxTopK.query(idx, blocks, q, model, k = 20,
          blockSize = 64L, boosts = boosts)
        .select(col("doc_id"),
          round(col("score") * lit(1e6)).cast("long").as("sm"))
        .orderBy(col("sm").desc, col("doc_id").asc)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(wand == exhaustive && wand.nonEmpty, s"query '$q'")
    }
    blocks.unpersist(); idx.unpersist(); src.unpersist()
  }
}
