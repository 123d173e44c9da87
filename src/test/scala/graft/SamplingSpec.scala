package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Deterministic stratified sampling ([[Sampling]]): the properties that
  * make a training-data mixture reproducible — the kept set is a pure
  * function of (id, stratum, rate, salt), independent of partitioning,
  * and rate thresholds NEST (lower-rate samples are strict subsets).
  */
class SamplingSpec extends TestBase {

  private def corpus = {
    import spark.implicits._
    (0L until 4000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
  }

  test("threshold maps [0,1] onto [0, 2^60] with exact endpoints") {
    assert(Sampling.threshold(0.0) == 0L)
    assert(Sampling.threshold(1.0) == Sampling.DrawSpace)
    assert(Sampling.threshold(0.5) == Sampling.DrawSpace / 2)
    intercept[IllegalArgumentException](Sampling.threshold(1.5))
    intercept[IllegalArgumentException](Sampling.threshold(-0.1))
  }

  test("rate 0 keeps nothing, rate 1 keeps everything") {
    val df = corpus
    val none = Sampling.stratifiedSample(df, "doc_id", "source",
      Map("src0" -> 0.0), defaultRate = 0.0)
    assert(none.count() == 0L)
    val all = Sampling.stratifiedSample(df, "doc_id", "source",
      (0 until 4).map(k => s"src$k" -> 1.0).toMap)
    assert(all.count() == df.count())
  }

  test("per-stratum rates are honored within binomial tolerance") {
    // 1000 rows per stratum; 4σ on Binomial(1000, p) is ≤ ~63 rows.
    val rates = Map("src0" -> 0.1, "src1" -> 0.5, "src2" -> 0.9, "src3" -> 0.0)
    val kept = Sampling.stratifiedSample(corpus, "doc_id", "source", rates)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("src3"))
    for ((s, r) <- rates if r > 0) {
      val n = kept(s)
      val tol = 4 * math.sqrt(1000 * r * (1 - r))
      assert(math.abs(n - 1000 * r) <= tol, s"$s: kept $n at rate $r")
    }
  }

  test("samples nest: the 30% sample is a subset of the 60% sample") {
    val lo = Sampling.stratifiedSample(corpus, "doc_id", "source",
      Map.empty, defaultRate = 0.3)
    val hi = Sampling.stratifiedSample(corpus, "doc_id", "source",
      Map.empty, defaultRate = 0.6)
    assert(lo.join(hi, Seq("doc_id"), "left_anti").count() == 0L)
    assert(lo.count() < hi.count())
  }

  test("kept set is partitioning-invariant and re-run-identical") {
    val rates = (0 until 4).map(k => s"src$k" -> (0.2 + 0.2 * k)).toMap
    def ids(parts: Int) =
      Sampling.stratifiedSample(corpus.repartition(parts), "doc_id",
        "source", rates)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val a = ids(1)
    assert(a == ids(7) && a == ids(32))
  }

  test("salt namespaces the draw: different salts give different samples") {
    val a = Sampling.stratifiedSample(corpus, "doc_id", "source",
      Map.empty, defaultRate = 0.5, salt = "mix")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(corpus, "doc_id", "source",
      Map.empty, defaultRate = 0.5, salt = "heldout")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != b)
    // both still ~50%: the salt moves WHICH rows, not HOW MANY
    assert(math.abs(a.size - 2000) < 200 && math.abs(b.size - 2000) < 200)
  }

  test("strata absent from the rate map fall back to defaultRate") {
    val kept = Sampling.stratifiedSample(corpus, "doc_id", "source",
      Map("src0" -> 1.0), defaultRate = 0.0)
    val bySrc = kept.groupBy("source").count().collect()
    assert(bySrc.length == 1 && bySrc.head.getString(0) == "src0" &&
      bySrc.head.getLong(1) == 1000L)
  }

  test("the filter is a map-side scan: no shuffle in the plan") {
    val plan = Sampling.stratifiedSample(corpus, "doc_id", "source",
      Map("src0" -> 0.5)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
