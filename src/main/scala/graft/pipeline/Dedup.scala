package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact,
  * shingle-Jaccard, MinHash+LSH, and SimHash near-dup.
  *
  * Scale notes (these run over the full corpus, unlike queries):
  *  - exact dedup = one hash-groupBy; the md5 key is uniform so there is no
  *    skew by construction.
  *  - candidate generation (shared shingle / LSH band / simhash piece) is a
  *    self-join on a bucket key. Hot buckets (a shingle appearing in
  *    thousands of docs) would go quadratic, so every candidate generator
  *    takes a `maxBucket` cap and DROPS buckets above it — the standard
  *    trade (a shingle that common carries no dedup signal anyway). The cap
  *    makes worst-case work O(Σ min(|bucket|, cap)²) instead of O(n²).
  *  - every DataFrame that feeds BOTH sides of a self-join (or ≥2 downstream
  *    aggregations) is `persist(MEMORY_AND_DISK)`-ed at that cut point —
  *    without it Spark re-executes the whole upstream explode pipeline once
  *    per consumer (measured 4× on `jaccardPairs`, 76% of the round-1 bench).
  *    On a real cluster the equivalent is a checkpoint table; MEMORY_AND_DISK
  *    spills instead of recomputing and is evicted LRU when memory is tight.
  *    The persists are OWNED by the caller-supplied [[CacheScope]] (the
  *    results are lazy, so the operator cannot unpersist them itself);
  *    consume the result and `close()` the scope — see [[CacheScope]]. With
  *    no explicit scope they land in [[CacheScope.global]].
  */
object Dedup {

  /** Exact duplicate groups by content hash: (fingerprint, n_dups, keep_id)
    * for groups of ≥ 2; `keep_id` = smallest doc id (the canonical
    * survivor).
    */
  def exactDupGroups(docs: DataFrame, id: String, text: String): DataFrame =
    TextStats.fingerprints(docs, id, text)
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_dups") >= 2)

  /** Exact dedup as a transform: keep one survivor per normalized-content
    * group (smallest doc id), preserving all input columns. One groupBy +
    * one join on the (uniform) hash key.
    */
  def dropExactDups(docs: DataFrame, id: String, text: String): DataFrame = {
    val fp = TextStats.fingerprints(docs, id, text)
    val keep = fp.groupBy(col("fingerprint")).agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    docs.join(keep, docs(id) === keep("doc_id"), "left_semi")
  }

  /** Distinct k-token shingles per doc: (doc_id, shingle). Tokenization is
    * materialized in its own projection BEFORE the shingle windows so the
    * window lambda indexes a bound array instead of re-splitting the text
    * per element (see [[Portable.shinglesOfTokens]]).
    */
  def docShingles(docs: DataFrame, id: String, text: String, k: Int): DataFrame =
    // explode_outer + post-generate null drop ≡ explode (shingles are
    // concat_ws results, never null; only empty arrays produce the null
    // row) — but unlike plain explode it gives the optimizer no
    // `size(shingles) > 0` filter to infer (InferFiltersFromGenerate) and
    // push below the parallelism floor: that pushed filter re-inlines the
    // WHOLE tokenize+window expression per element into the one-split scan
    // stage, serializing an O(tokens·k) re-split per doc into a single
    // task (measured: 4.1 s of the old q12's 5.5 s; the §4.4 trap again,
    // this time optimizer-inferred rather than user-written)
    docShingleArrays(docs, id, text, k)
      .select(col("doc_id"), explode_outer(col("_shs")).as("shingle"))
      .filter(col("shingle").isNotNull)

  /** Pre-explode form: `(doc_id, _shs = DISTINCT shingle array)` — one row
    * per doc. The Jaccard paths persist THIS frame instead of the exploded
    * one: per-doc set sizes then come off it NARROW (`size(_shs)`, no
    * shuffle — the old shape re-aggregated the exploded rows back by doc,
    * a corpus-sized groupBy paid per query), and each consumer re-explodes
    * from the cached arrays, which is a cheap array traversal next to the
    * tokenize+window work the cache already holds.
    */
  private[graft] def docShingleArrays(docs: DataFrame, id: String,
      text: String, k: Int): DataFrame =
    Portable.parallelized(docs)
      .select(col(id).cast("long").as("doc_id"),
        Portable.tokens(col(text)).as("_toks"))
      .select(col("doc_id"),
        array_distinct(Portable.shinglesOfTokens(col("_toks"), k)).as("_shs"))

  /** Exact n-gram Jaccard near-dup pairs: candidates = doc pairs sharing at
    * least one (non-hot) shingle; Jaccard over DISTINCT shingle sets;
    * output (id_a < id_b, inter, size_a, size_b, jaccard) with
    * jaccard ≥ minJaccard.
    *
    * `maxBucket` trades recall for work: a shingle shared by more than
    * `maxBucket` docs produces NO candidate pairs (it is boilerplate and
    * alone contributes up to cap²/2 pairs). The default stays at the
    * original 1000 for caller compatibility; pass a tighter cap (the
    * contract query uses 200) when throughput matters more than recall in
    * the 200–1000 band — or use [[jaccardPairsViaLsh]], whose recall is
    * governed by the LSH S-curve instead of a hot-bucket cap and which is
    * the structurally sub-quadratic path at corpus scale.
    */
  def jaccardPairs(docs: DataFrame, id: String, text: String, k: Int,
      minJaccard: Double, maxBucket: Int = 1000,
      scope: CacheScope = CacheScope.global): DataFrame = {
    // the per-doc ARRAY frame is the persisted cut: sizes come off it
    // narrow (no groupBy-by-doc shuffle), and the downstream consumers
    // (cold + pruned) re-explode from the cache — see docShingleArrays
    val arr = scope.cut(docShingleArrays(docs, id, text, k))
    val sh = arr.select(col("doc_id"), explode(col("_shs")).as("shingle"))
    val sizes = arr.select(col("doc_id"), size(col("_shs")).as("sz"))
    val cold = sh.groupBy(col("shingle")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket && col("bsz") >= 2)
    val pruned = scope.cut(sh.join(cold.select("shingle"), Seq("shingle")))
    val pairs = pruned.as("l").join(pruned.as("r"),
        col("l.shingle") === col("r.shingle") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "size_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "size_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
  }

  /** Scalable near-dup Jaccard — the 100-TB path: candidate pairs come from
    * MinHash-LSH banding (structurally sub-quadratic; recall bounded by the
    * LSH S-curve instead of a hot-bucket cap), and exact DISTINCT-shingle
    * Jaccard is computed ONLY on candidates. Same output schema as
    * [[jaccardPairs]] (whose shared-shingle candidate generation is
    * exact-recall below the cap but quadratic in bucket size).
    */
  def jaccardPairsViaLsh(docs: DataFrame, id: String, text: String, k: Int,
      numHashes: Int, rowsPerBand: Int, minJaccard: Double,
      maxBucket: Int = 10000, scope: CacheScope = CacheScope.global): DataFrame = {
    require(minJaccard > 0, "zero-intersection candidates are dropped")
    // persist the pre-explode array frame (docShingleArrays scaladoc):
    // sizes are narrow off it, the md5 signature pass and the two
    // intersection joins re-explode from the cache
    val arr = scope.cut(docShingleArrays(docs, id, text, k))
    val sh = arr.select(col("doc_id"), explode(col("_shs")).as("shingle"))
    val cands = lshCandidates(minhashFromShingles(sh, numHashes), rowsPerBand,
      maxBucket, scope)
    val sizes = arr.select(col("doc_id"), size(col("_shs")).as("sz"))
    // |A ∩ B| per candidate pair: fan the (small) candidate set out to the
    // left doc's shingles, then an equi-join on (right doc, shingle)
    val inter = cands
      .join(sh.select(col("doc_id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "size_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "size_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
  }

  /** Benchmark DECONTAMINATION — the training-pipeline operator that flags
    * corpus documents overlapping an evaluation/benchmark set (the
    * GPT-3/Pile-style n-gram overlap check, k parametrized): for every
    * corpus doc, how many of its DISTINCT k-token shingles appear anywhere
    * in the benchmark corpus, plus the contaminated fraction. Docs with
    * fewer than k tokens have no shingles and report (0, 0, 0.0).
    *
    * Scale shape: the benchmark set is tiny next to a 100-TB training
    * corpus, so its distinct shingle set BROADCASTS; the corpus side is
    * one shingle explode + broadcast left-semi join + per-doc count — the
    * only corpus-data shuffle is the partial-aggregated per-doc count.
    * (For a benchmark set too large to broadcast, drop to the same
    * bucketed equi-join [[jaccardPairs]] uses; the per-doc aggregation is
    * unchanged.)
    */
  def contamination(docs: DataFrame, id: String, text: String,
      bench: DataFrame, benchText: String, k: Int = 3): DataFrame = {
    val ds = docShingles(docs, id, text, k)
    val bs = docShingles(bench.select(lit(0L).as("_bid"), col(benchText)),
      "_bid", benchText, k).select(col("shingle")).distinct()
    val total = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val contam = ds.join(broadcast(bs), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    docs.select(col(id).cast("long").as("doc_id"))
      .join(total, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_shingles", "n_contaminated"))
      .withColumn("contam_frac",
        when(col("n_shingles") > 0,
          col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** MinHash signatures: (doc_id, h, minhash) for h in 0 until numHashes,
    * minhash = min over the doc's distinct shingles of hash_h(shingle).
    * Docs with no shingles get no signature rows.
    *
    * One explode + one groupBy; the md5-family hash is portable (DuckDB
    * oracle computes identical values).
    */
  def minhashSignatures(docs: DataFrame, id: String, text: String, k: Int,
      numHashes: Int): DataFrame =
    minhashFromShingles(docShingles(docs, id, text, k), numHashes)

  /** Signature pipeline over an existing (doc_id, shingle) DataFrame: ONE
    * md5 per shingle, the `numHashes` family members derived arithmetically
    * (Carter–Wegman, [[Portable.md5Halves]]) — not one digest per
    * (shingle, j). At 100 TB the digest dominates; this makes the
    * signature stage numHashes× cheaper.
    */
  private[graft] def minhashFromShingles(sh: DataFrame, numHashes: Int): DataFrame = {
    // native digest→two-longs (no hex encode / substring / base-16 parse
    // per shingle); value-identical to Portable.md5Halves over md5(col)
    val base = sh
      .withColumn("_h", graft.functions.Md5Halves.halvesCol(col("shingle")))
      .select(col("doc_id"), col("_h.h1").as("_h1"), col("_h.h2").as("_h2"))
    // ONE groupBy(doc) with numHashes fixed-width min buffers instead of
    // exploding numHashes rows per shingle into the shuffle: map-side
    // combine collapses each partition to one row per doc, so the exchange
    // carries ~numHashes× less volume; the (doc_id, h, minhash) row shape
    // is restored by a post-agg unpivot over already-tiny data
    val minCols = (0 until numHashes).map(j =>
      min(Portable.md5FamilyMember(col("_h1"), col("_h2"), j)).as(s"_m$j"))
    base.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        posexplode(array((0 until numHashes).map(j => col(s"_m$j")): _*))
          .as(Seq("h", "minhash")))
  }

  /** LSH banding over minhash signatures: rowsPerBand consecutive hashes
    * hash together into a band key; docs sharing a (band, key) bucket are
    * candidate pairs. Output (id_a < id_b) distinct.
    */
  def lshCandidates(signatures: DataFrame, rowsPerBand: Int,
      maxBucket: Int = 10000, scope: CacheScope = CacheScope.global): DataFrame = {
    // one small row per (doc, band); feeds cold + both self-join sides, so
    // persist — otherwise the whole minhash pipeline upstream re-runs ≥3×
    val banded = scope.cut(signatures
      .withColumn("band", (col("h") / rowsPerBand).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(concat_ws(",", sort_array(collect_list(
        concat_ws(":", col("h"), col("minhash")))))).as("bkey")))
    val cold = banded.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket && col("bsz") >= 2)
    val pruned = banded.join(cold.select("band", "bkey"), Seq("band", "bkey"))
    pruned.as("l").join(pruned.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .distinct()
  }

  /** Connected components over an undirected candidate-pair edge set (the
    * first two columns of `pairs` are the endpoint ids): the transitive
    * closure step every near-dup pipeline needs between "candidate PAIRS"
    * ([[lshCandidates]] / [[jaccardPairsViaLsh]] / [[simhashNearDups]])
    * and "keep ONE doc per duplicate CLUSTER". Output `(id, component)`
    * for every id appearing in `pairs`, where `component` = the minimum
    * id reachable from it.
    *
    * Algorithm: iterative hash-min label propagation WITH pointer jumping
    * (label(x) ← min over {x} ∪ neighbors, then label(x) ← label(label(x)))
    * — each iteration is two shuffles over (edges ⋈ labels), convergence
    * in O(log diameter) iterations. Near-dup clusters are shallow (a dup
    * cluster's diameter is small by construction — members all resemble
    * one another), so this settles in 2–4 iterations; the driver runs one
    * tiny `count` per iteration for the fixpoint check, never the data.
    * No GraphX dependency, plain DataFrame ops, AQE-compatible.
    */
  /** Edge-count cap for the driver-side union-find fast path: 1M edges ≈
    * 16 MB of driver heap. A near-dup pair graph under the cap is solved
    * in microseconds of driver CPU instead of ~4 Spark jobs per
    * propagation round; above it the distributed loop takes over.
    */
  val MaxCollectedEdges: Int = 1 << 20

  def components(pairs: DataFrame, maxIter: Int = 20,
      scope: CacheScope = CacheScope.global,
      maxCollectedEdges: Int = MaxCollectedEdges): DataFrame = {
    val a = pairs.columns(0); val b = pairs.columns(1)
    val e0 = pairs.select(col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
    if (maxCollectedEdges > 0) {
      val collected = e0.limit(maxCollectedEdges + 1).collect()
      if (collected.length <= maxCollectedEdges) {
        val spark = pairs.sparkSession
        import spark.implicits._
        // path-compressed union-find, then normalize every root to the
        // MINIMUM member id — identical labels to the propagation loop
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        collected.foreach { row =>
          val (s, d) = (row.getLong(0), row.getLong(1))
          parent.getOrElseUpdate(s, s); parent.getOrElseUpdate(d, d)
          val (rs, rd) = (find(s), find(d))
          if (rs != rd) { if (rs < rd) parent(rd) = rs else parent(rs) = rd }
        }
        val out = parent.keys.toArray.map(v => (v, find(v)))
        return out.toSeq.toDF("id", "component")
      }
      // fell through: over the cap — run distributed (the collect cost is
      // one pass over the edge list, which the loop's first join pays
      // anyway)
    }
    componentsDistributed(e0, maxIter, scope)._1
  }

  /** The distributed propagation loop behind [[components]], exposed with
    * its iteration count for scale evidence (ComponentsScaleProbe): input
    * must already be (src, dst) long columns.
    */
  private[graft] def componentsDistributed(e0: DataFrame, maxIter: Int = 20,
      scope: CacheScope = CacheScope.global): (DataFrame, Int) = {
    // symmetrize once; feeds every iteration's join
    val edges = scope.cut(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    // LINEAGE TRUNCATION, not just caching: persist() short-circuits
    // re-execution but keeps the full logical plan, so an iterative loop
    // hands Catalyst a join tree one level deeper per iteration —
    // analysis/optimization time grows super-linearly and at real edge
    // counts (≥10M, ~13 iterations for a 4096-node chain) the DRIVER
    // becomes the bottleneck while executors idle (measured: the 10M-edge
    // ComponentsScaleProbe did not finish in 45 min on the persist-only
    // loop; it runs in ~2 min with truncation — BENCH.md round 5).
    // localCheckpoint (eager) materializes the iteration AND replaces its
    // plan with the stored partitions, keeping per-iteration plan size
    // constant. Deployment note: localCheckpoint ties the loop to
    // executor lifetime — a cluster wanting executor-loss tolerance sets
    // spark.checkpoint.dir and swaps in reliable checkpoint() every few
    // iterations; the loop structure is unchanged.
    // `ckpt` tracks the ITERATION'S OWN checkpoint frame (whose analyzed
    // plan is the LogicalRDD holding the blocks) — `labels` is a
    // projection over it, so releasing must target ckpt, not labels
    var ckpt = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var labels = ckpt
    var it = 0
    var changed = 1L
    while (changed > 0) {
      require(it < maxIter, s"components did not converge in $maxIter iterations")
      // hash-min: component ← min over self and neighbors' components
      val nbrMin = edges.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min(col("component")).as("_nmin"))
      val propagated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("component").as("_old"),
          least(col("component"), coalesce(col("_nmin"), col("component")))
            .as("component"))
      // pointer jumping: component ← component's own label (halves the
      // remaining path length each iteration). The pre-iteration label
      // rides along as `_old`, so convergence is a count over THIS
      // result instead of a fourth join+shuffle against the old labels.
      val step = propagated.as("x")
        .join(labels.select(col("id").as("_pid"), col("component").as("_pcomp")),
          col("x.component") === col("_pid"), "left")
        .select(col("x.id").as("id"), col("x._old").as("_old"),
          least(col("x.component"), coalesce(col("_pcomp"), col("x.component")))
            .as("component"))
        .localCheckpoint()
      changed = step.filter(col("component") =!= col("_old")).count()
      // release the PREVIOUS iteration's checkpoint blocks for real:
      // Dataset.unpersist is a no-op on a localCheckpoint'd frame (its
      // storage is the wrapped RDD's persist layer, not a CacheManager
      // entry) — without this the loop pins one full label-set copy per
      // iteration until driver GC. Safe here: `step` is already
      // materialized (eager checkpoint + the count above), so nothing
      // reads the old labels again.
      org.apache.spark.sql.graftbridge.uncheckpoint(ckpt)
      ckpt = step
      labels = step.select(col("id"), col("component"))
      it += 1
    }
    // hand the result to the caller's cache scope (persist is a cheap
    // layer over the checkpoint blocks); the intermediate checkpoints
    // are released above and the last one when its RDD is GC'd after the
    // returned frame drops out of scope
    (scope.cut(labels), it)
  }

  /** Near-dup dedup as a transform: drop every doc that is a NON-canonical
    * member of a pair-connected cluster (canonical = minimum id), keeping
    * all input columns. Docs in no pair survive untouched.
    */
  def dropNearDups(docs: DataFrame, id: String, pairs: DataFrame,
      scope: CacheScope = CacheScope.global): DataFrame = {
    val losers = components(pairs, scope = scope)
      .filter(col("component") =!= col("id")).select(col("id"))
    docs.join(losers, docs(id) === losers("id"), "left_anti")
  }

  /** 32-bit SimHash over whitespace terms, tf-weighted: bit b is set when
    * Σ_terms tf · sign(bit b of hash(term)) > 0. Portable md5-based term
    * hash; the vote aggregation is one explode + groupBy.
    */
  def simhash32(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = Portable.parallelized(docs)
      .select(col(id).cast("long").as("doc_id"),
        explode(Portable.tokens(col(text))).as("term"))
    val termVotes = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("th", Portable.md5Long(col("term")))
    val bits = (0 until 32).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(lit(1L)) === 1L, col("tf"))
        .otherwise(-col("tf"))).as(s"_v$b")
    }
    termVotes.groupBy(col("doc_id"))
      .agg(bits.head, bits.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b =>
          when(col(s"_v$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming (≤ 3 for the
    * default piece split): split the 32-bit hash into 4 bytes; by
    * pigeonhole, any pair within distance 3 agrees exactly on ≥ 1 byte —
    * join on (piece index, piece value), then filter exact Hamming.
    */
  def simhashNearDups(hashes: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 10000, scope: CacheScope = CacheScope.global): DataFrame = {
    require(maxHamming <= 3, "4-piece split guarantees recall only to distance 3")
    val pieces = scope.cut(hashes.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(p =>
        shiftright(col("simhash"), p * 8).bitwiseAND(lit(0xffL))): _*))
        .as(Seq("p", "pv")))) // feeds cold + both join sides
    val cold = pieces.groupBy(col("p"), col("pv"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket && col("bsz") >= 2)
    val pruned = pieces.join(cold.select("p", "pv"), Seq("p", "pv"))
    pruned.as("l").join(pruned.as("r"),
        col("l.p") === col("r.p") && col("l.pv") === col("r.pv") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Every n-token span of every doc, keyed by a portable content hash:
    * `(doc_id, span_key)`, one row per OCCURRENCE (span-level dedup counts
    * repeats, unlike the distinct-shingle Jaccard path). md5 of the
    * space-joined window — the pipeline's standard portable hash (one
    * crypto hash per span, same as the minhash stage; at deployment swap
    * for xxhash128 if profile says so — the key only needs uniformity).
    */
  private def spanKeys(docs: DataFrame, docIdCol: String, textCol: String,
      n: Int): DataFrame =
    // explode_outer + null drop: same InferFiltersFromGenerate dodge as
    // [[docShingles]] (spans are concat_ws results, never null)
    Portable.parallelized(docs)
      .select(col(docIdCol).cast("long").as("doc_id"),
        Portable.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"),
        explode_outer(Portable.shinglesOfTokens(col("_toks"), n)).as("_span"))
      .filter(col("_span").isNotNull)
      .select(col("doc_id"), md5(col("_span")).as("span_key"))

  /** Exact duplicate-SPAN detection — the span-level dedup signal of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"): every verbatim n-token window shared by at least `minDocs`
    * DISTINCT docs. Returns `(span_key, n_docs, n_occ)`.
    *
    * Scale: one explode (×tokens-per-doc, the same fan-out as every
    * shingle stage) into one partial-aggregated groupBy on a uniform hash
    * key — no self-join, no skew (a hot span has many rows but they
    * map-side-combine). The full suffix-array construction the paper uses
    * finds MAXIMAL spans; the fixed-n windowed form here is its standard
    * scalable approximation (any duplicated span ≥ n tokens is caught by
    * its n-token sub-windows).
    */
  def duplicateSpans(docs: DataFrame, docIdCol: String, textCol: String,
      n: Int = 32, minDocs: Int = 2): DataFrame = {
    require(n > 0 && minDocs >= 2, "need n > 0, minDocs >= 2")
    spanKeys(docs, docIdCol, textCol, n)
      .groupBy(col("span_key"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Per-document duplicate-span exposure: how much of each doc is made of
    * corpus-duplicated n-token spans — `(doc_id, n_spans, n_dup_spans)`
    * for every doc with at least one span (shorter docs have none). The
    * filter signal is `n_dup_spans / n_spans`; thresholding it is the
    * span-level analog of doc-level near-dup dropping.
    *
    * Two aggregations over the span stream (total + duplicated), so the
    * span frame is a [[CacheScope]] cut; the duplicated-key side arrives
    * via semi-join against [[duplicateSpans]] keys (shuffle-safe at any
    * duplicate cardinality — no driver collect, no broadcast assumption).
    */
  def spanDupStats(docs: DataFrame, docIdCol: String, textCol: String,
      n: Int = 32, minDocs: Int = 2,
      scope: CacheScope = CacheScope.global): DataFrame = {
    require(n > 0 && minDocs >= 2, "need n > 0, minDocs >= 2")
    val sp = scope.cut(spanKeys(docs, docIdCol, textCol, n))
    val dupKeys = sp.groupBy(col("span_key"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs).select(col("span_key"))
    val totals = sp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
    val dups = sp.join(dupKeys, Seq("span_key"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_spans"))
    totals.join(dups, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
  }
}
