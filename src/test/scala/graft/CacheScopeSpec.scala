package graft

import graft.pipeline.{CacheScope, Dedup, Similarity}

/** Pipeline-operator cache ownership: the persist cut points inside
  * Dedup/Similarity must be released when their [[CacheScope]] closes, so a
  * long-lived driver composing these operators does not accumulate pinned
  * storage (ADVICE round 2).
  */
class CacheScopeSpec extends TestBase {

  private def persistedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  private def corpus = {
    import spark.implicits._
    (0L until 60L).map(i =>
      (i, s"token${i % 7} shared words here token${i % 5} tail${i % 11} a b c"))
      .toDF("doc_id", "text")
  }

  private def vectors = {
    import spark.implicits._
    (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("withScope releases every Dedup persist after the result is consumed") {
    val before = persistedCount
    CacheScope.withScope { scope =>
      val r1 = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.01,
        scope = scope).collect()
      val r2 = Dedup.jaccardPairsViaLsh(corpus, "doc_id", "text", 3, 4, 2,
        0.01, scope = scope).collect()
      val r3 = Dedup.simhashNearDups(
        Dedup.simhash32(corpus, "doc_id", "text"), 3, scope = scope).collect()
      // scope is live inside the block: the operators did persist something
      assert(persistedCount > before, "expected live persists inside the scope")
      assert(r1.nonEmpty && r2.nonEmpty && (r3.length >= 0))
    }
    assert(persistedCount == before,
      s"cache leak: $persistedCount persisted RDDs remain (baseline $before)")
  }

  test("withScope releases the Similarity.cosineNearDups persist") {
    val before = persistedCount
    CacheScope.withScope { scope =>
      Similarity.cosineNearDups(vectors, "vec_id", "embedding", 8, 4,
        minCos = 0.0, scope = scope).collect()
      ()
    }
    assert(persistedCount == before)
  }

  test("global scope is releasable without touching unrelated caches") {
    import spark.implicits._
    // earlier suites may have parked default-scope persists in the global
    // scope: flush them so the baseline below is this test's own
    CacheScope.releaseGlobal()
    val unrelated = Seq((1L, "keep")).toDF("id", "v").cache()
    unrelated.count()
    val before = persistedCount
    // default-scope call lands in CacheScope.global
    Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.01).collect()
    assert(persistedCount > before)
    CacheScope.releaseGlobal()
    assert(persistedCount == before, "releaseGlobal left pipeline caches behind")
    assert(unrelated.storageLevel.useMemory, "releaseGlobal evicted an unrelated cache")
    unrelated.unpersist()
    ()
  }
}
