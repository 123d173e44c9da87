package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal, Similarity, TextStats}

/** Training-data pipeline operators: semantics on synthetic corpora with
  * known duplicates, and approximate paths validated against exact ones.
  */
class PipelineSpec extends TestBase {
  import scala.collection.immutable.Seq

  private def docsWithDups = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
      (2L, "The  Quick Brown fox jumps over the lazy dog"), // norm-dup of 0
      (3L, "the quick brown fox jumps over a sleepy dog"), // near-dup
      (4L, "completely different content about spark engines"),
      (5L, "entirely unrelated text regarding database systems")
    ).toDF("doc_id", "text")
  }

  test("components loop releases each iteration's checkpoint storage") {
    import spark.implicits._
    import graft.pipeline.CacheScope
    // Dataset.unpersist is a NO-OP on localCheckpoint'd frames (their
    // blocks live on the wrapped RDD, not in the CacheManager); the loop
    // releases each iteration's blocks explicitly via
    // graftbridge.uncheckpoint, making PEAK storage deterministic (≤ 3
    // frames live at any instant) instead of GC-whenever (ContextCleaner
    // reclaims dropped RDDs only after the driver happens to collect
    // them — unbounded peak on big iterative workloads).
    // 1) the helper itself: releases exactly the checkpoint's blocks
    val df = (0L until 100L).map(i => (i, i % 7)).toDF("a", "b")
    val base = spark.sparkContext.getPersistentRDDs.size
    val c1 = df.localCheckpoint()
    val c2 = c1.select(col("a")).localCheckpoint()
    assert(spark.sparkContext.getPersistentRDDs.size == base + 2)
    org.apache.spark.sql.graftbridge.uncheckpoint(c1)
    org.apache.spark.sql.graftbridge.uncheckpoint(c2)
    assert(spark.sparkContext.getPersistentRDDs.size == base)
    // non-checkpoint frames are a safe no-op
    org.apache.spark.sql.graftbridge.uncheckpoint(df)
    // 2) the loop: at completion at most {edges, final ckpt, scope
    //    persist} remain, regardless of iteration count
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.size
    CacheScope.withScope { s =>
      val (labels, iters) =
        graft.pipeline.Dedup.componentsDistributed(edges, scope = s)
      assert(labels.filter(col("component") =!= 0L).count() == 0)
      assert(iters >= 3, s"chain should take several iterations, got $iters")
      val during = spark.sparkContext.getPersistentRDDs.size
      assert(during - before <= 3,
        s"checkpoint storage leaked: before=$before during=$during iters=$iters")
    }
  }

  test("components: transitive closure over pair chains, min-id labels") {
    import spark.implicits._
    // a 5-node PATH (forces multi-hop propagation — no pair links 10 to
    // 14 directly), one 2-cluster, and a triangle with redundant edges
    val pairs = Seq(
      (11L, 10L), (11L, 12L), (12L, 13L), (14L, 13L), // path 10..14
      (5L, 6L),                                       // pair
      (20L, 21L), (21L, 22L), (20L, 22L)              // triangle
    ).toDF("id_a", "id_b")
    val want = Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      5L -> 5L, 6L -> 5L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    // driver union-find fast path (default) AND the distributed
    // propagation loop (forced by a zero collect cap) must agree exactly
    val fast = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.components(pairs, maxCollectedEdges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == want)
    assert(dist == want)
  }

  test("dropNearDups keeps the canonical member per cluster + singletons") {
    import spark.implicits._
    val docs = Seq.tabulate(8)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (3L, 5L), (6L, 7L)).toDF("id_a", "id_b")
    val survivors = Dedup.dropNearDups(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // clusters {1,3,5}→keep 1 and {6,7}→keep 6; 0,2,4 untouched
    assert(survivors == Set(0L, 1L, 2L, 4L, 6L))
  }

  test("exact dedup finds normalized duplicate groups") {
    val groups = Dedup.exactDupGroups(docsWithDups, "doc_id", "text").collect()
    assert(groups.length == 1)
    assert(groups.head.getLong(1) == 3) // docs 0,1,2 normalize identically
    assert(groups.head.getLong(2) == 0L) // keep_id = min
  }

  test("n-gram jaccard pairs rank the near-dup above unrelated docs") {
    val pairs = Dedup.jaccardPairs(docsWithDups, "doc_id", "text", 3, 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    // 0-1-2 mutually identical → jaccard 1.0; 0-3 share most shingles
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 3L)) && pairs((0L, 3L)) > 0.3 && pairs((0L, 3L)) < 1.0)
    assert(!pairs.contains((4L, 5L)))
  }

  test("LSH-routed jaccard agrees with exact jaccard on recovered pairs") {
    val viaLsh = Dedup.jaccardPairsViaLsh(docsWithDups, "doc_id", "text",
      3, 8, 2, 0.3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    val exact = Dedup.jaccardPairs(docsWithDups, "doc_id", "text", 3, 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    // every LSH-recovered pair carries the EXACT jaccard value
    viaLsh.foreach { case (k, v) => assert(exact.get(k).contains(v), s"$k") }
    // identical docs are always recovered (identical signatures)
    assert(viaLsh.contains((0L, 1L)) && viaLsh((0L, 1L)) == 1.0)
    assert(!viaLsh.contains((4L, 5L)))
  }

  test("minhash+LSH candidates recover exact and near duplicates") {
    val sigs = Dedup.minhashSignatures(docsWithDups, "doc_id", "text", 3, 8)
    // identical docs ⇒ identical signatures
    val s01 = sigs.filter(col("doc_id").isin(0L, 1L))
      .groupBy("h").agg(countDistinct("minhash").as("d")).collect()
    assert(s01.forall(_.getLong(1) == 1))
    val cands = Dedup.lshCandidates(sigs, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)))
    assert(!cands.contains((4L, 5L)))
  }

  test("simhash: identical docs equal, near-dups close, unrelated far") {
    val h = Dedup.simhash32(docsWithDups, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(h(0L) == h(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(0L), h(3L)) < hamming(h(0L), h(4L)))
    val nd = Dedup.simhashNearDups(Dedup.simhash32(docsWithDups, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((0L, 1L)))
  }

  test("sign-LSH top-k matches brute force on the real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 7).select("embedding").head().getSeq[Float](0)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 5)
      .collect().map(_.getLong(0)).toSeq
    val approx = Similarity.lshCosineTopK(emb, "vec_id", "embedding", 64, 8, q, 5)
      .collect().map(_.getLong(0)).toSeq
    // the query vector itself must be found, and recall@5 ≥ 2/5 with
    // 8-bit buckets + hamming-1 multiprobe on 500 vectors
    assert(approx.contains(7L))
    assert(exact.toSet.intersect(approx.toSet).size >= 2,
      s"exact=$exact approx=$approx")
  }

  test("cosine near-dup pairs: self-similar clusters only") {
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    // append exact copies with shifted ids → cos = 1 pairs must be found
    val dup = base.select((col("vec_id") + 1000).as("vec_id"), col("embedding"), col("label"))
    val pairs = Similarity.cosineNearDups(base.union(dup), "vec_id", "embedding", 64, 8, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 50).forall(i => pairs.contains((i.toLong, i + 1000L))))
  }

  test("language-ID prefers the language whose markers dominate") {
    import spark.implicits._
    val d = Seq(
      (0L, "the cat and the dog of the house"),
      (1L, "el gato y la casa de la ciudad que es"),
      (2L, "le chat et les maisons des villes est")).toDF("doc_id", "text")
    val out = TextStats.languageId(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(0L) == "en" && out(1L) == "es" && out(2L) == "fr")
  }

  test("quality score is bounded and penalizes token-free docs") {
    import spark.implicits._
    val d = Seq((0L, "the quick brown fox is a good doc with many fine tokens " +
      "and some more words here to pass twenty tokens total okay"),
      (1L, ""), (2L, "!!! ### $$$")).toDF("doc_id", "text")
    val q = TextStats.qualityScores(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getAs[Double]("quality"))).toMap
    assert(q(0L) > 0.5 && q(0L) <= 1.0)
    assert(q(1L) == 0.0)
    assert(q(2L) < 0.1)
  }

  test("PII redaction: counts + rewrite, URL-embedded addresses, clean docs untouched") {
    import spark.implicits._
    val d = Seq(
      (0L, "mail me at bob.smith+x@corp.example.org or visit https://a.b/c?d=e now"),
      (1L, "server at 192.168.1.100 and 10.0.0.1 replied"),
      (2L, "nothing to scrub here"),
      // the email is part of the URL: the URL rewrite consumes it ([^\s]+
      // runs to the space), counts still see both patterns on the original
      (3L, "creds http://user@host.example.com/path end"))
      .toDF("doc_id", "text")
    val out = TextStats.redactPii(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(0L) == ((1L, 1L, 0L,
      "mail me at <EMAIL> or visit <URL> now")))
    assert(out(1L) == ((0L, 0L, 2L, "server at <IP> and <IP> replied")))
    assert(out(2L) == ((0L, 0L, 0L, "nothing to scrub here")))
    assert(out(3L) == ((1L, 1L, 0L, "creds <URL> end")))
  }

  test("repetition stats: hand-computed fractions, degenerate inputs, long-doc fold") {
    import spark.implicits._
    val d = Seq(
      // 4 lines, "dup me" twice → dup 1/4; tokens: dup me x dup me y dup me
      // (8 toks incl. newline-free split below uses spaces only)
      (0L, "dup me\ndup me\nother line\nlast"),
      (1L, ""), // empty: all zeros
      (2L, "single"), // one token, no bigram
      (3L, "a b a b a b a b"), // "a b" 4 of 7 slots, "b a" 3
      (4L, (1 to 500).map(i => s"t${i % 3}").mkString(" "))) // long fold
      .toDF("doc_id", "text")
    val out = TextStats.repetitionStats(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 0: lines = [dup me, dup me, other line, last] → (4-3)/4
    assert(out(0L)._1 == 4 && math.abs(out(0L)._2 - 0.25) < 1e-12)
    assert(out(1L) == ((0L, 0.0, 0L, 0.0)))
    assert(out(2L) == ((1L, 0.0, 0L, 0.0)))
    // doc 3: 8 tokens, 7 bigram slots, top bigram "a b" ×4
    assert(out(3L)._3 == 4L && math.abs(out(3L)._4 - 4.0 / 7.0) < 1e-12)
    // doc 4: tokens cycle t1 t2 t0; 500 tokens → 499 slots; each of the 3
    // bigram kinds appears ~166×; top = ceil counts: "t1 t2" starts at
    // positions 1,4,... → count = 167? compute independently:
    val toks = (1 to 500).map(i => s"t${i % 3}")
    val counts = toks.sliding(2).map(_.mkString(" ")).toSeq
      .groupBy(identity).view.mapValues(_.size)
    val want = counts.values.max.toLong
    assert(out(4L)._3 == want && math.abs(out(4L)._4 - want / 499.0) < 1e-12)
  }

  test("decontamination: overlap counts against a benchmark set") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a b c d e"),      // shingles: abc, bcd, cde
      (1L, "c d e f"),        // cde, def → 1 of 2 contaminated (cde)
      (2L, "x y z w"),        // xyz, yzw → clean
      (3L, "a b")             // no shingles (< 3 tokens)
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e")).toDF("bid", "text") // abc, bcd, cde
    val got = Dedup.contamination(corpus, "doc_id", "text", bench, "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (0L, 3L, 3L, 1.0),
      (1L, 2L, 1L, 0.5),
      (2L, 2L, 0L, 0.0),
      (3L, 0L, 0L, 0.0)))
  }

  test("multimodal decode: real header round-trip, determinism, batch plumbing") {
    val media = Multimodal.syntheticMedia(docsWithDups, "doc_id", "text")
    val a = Multimodal.decodeFeatures(media, "doc_id", "media").collect()
    val b = Multimodal.decodeFeatures(media, "doc_id", "media").collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    assert(a.length == 6)
    // the decoded dims must round-trip the synthesis formula through REAL
    // PNG/JPEG header bytes
    for (r <- a) {
      val txt = docsWithDups.filter(col("doc_id") === r.getLong(0))
        .head().getString(1).getBytes("UTF-8")
      assert(r.getString(2) == (if (txt.length % 2 == 0) "png" else "jpeg"))
      assert(r.getInt(3) == 64 + (txt(0) & 0xff) % 64)
      assert(r.getInt(4) == 64 + (txt(1) & 0xff) % 64)
      assert(r.getSeq[Float](5).length == 8)
      if (r.getString(2) == "png") {
        // synthetic PNGs hold all-zero pixels and must take the REAL
        // pixel-decode path: luminance histogram = 100% in bin 0
        assert(r.getString(6) == "png-pixels")
        assert(math.abs(r.getSeq[Float](5).head - 1.0f) < 1e-6)
      } else {
        // the header-only JPEG stub has no scan data: every decoder
        // refuses it and the byte-histogram fallback is TAGGED as such
        assert(r.getString(6) == "bytes")
      }
    }
  }
}
