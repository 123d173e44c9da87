package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, sign-LSH bucketing as the approximate scale path, and
  * embedding-cosine near-duplicate pairs.
  *
  * Vectors are `array<float>` columns; all math is done in double in
  * index order (deterministic accumulation), no UDFs. The dot product is
  * a native fused Expression ([[graft.functions.DotProductFF]]) — one
  * codegen'd loop over the Tungsten arrays instead of `zip_with` +
  * `aggregate`'s per-row intermediate array; bit-identical results
  * (same accumulation order, pinned by DotProductSpec).
  */
object Similarity {

  /** Σ a(i)·b(i) accumulated in double, in index order (float arrays). */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductFF.dotCol(a, b)

  /** The composed-builtins formulation of [[dot]] (reference semantics for
    * the parity test; also the fallback for non-float numeric arrays).
    */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k against a literal query vector: one
    * scan, no shuffle, top-k via TakeOrderedAndProject. The baseline every
    * ANN variant is parity-tested against.
    */
  def cosineTopK(emb: DataFrame, id: String, vec: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    emb.select(col(id).cast("long").as("vec_id"),
        cosine(col(vec), q).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Sign-LSH bucket id: bit b of the bucket = sign(v · h_b) where h_b is a
    * deterministic ±1 hyperplane derived from md5("hp:b:i"). nBits ≤ 16
    * keeps buckets populated at moderate corpus sizes. Fused native
    * expression ([[graft.functions.SignLsh]]): all nBits projections in
    * one loop, no per-row intermediate arrays — bit-identical buckets to
    * [[signLshBucketComposed]] (pinned by SignLshSpec) and to the DuckDB
    * oracles.
    */
  def signLshBucket(vec: Column, dim: Int, nBits: Int): Column =
    graft.functions.SignLsh.bucketCol(vec, dim, nBits)

  /** The composed-builtins formulation (parity reference for the test). */
  def signLshBucketComposed(vec: Column, dim: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { b =>
      // hyperplane component h_b(i) ∈ {−1, +1}, derived portably
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)), (v, i) =>
          v.cast("double") *
            when(Portable.md5Long(concat(lit(s"hp:$b:"), i.cast("string")))
              .bitwiseAND(lit(1L)) === 1L, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1), b)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** (vec_id, bucket) assignment for the whole corpus. */
  def lshBuckets(emb: DataFrame, id: String, vec: String, dim: Int,
      nBits: Int): DataFrame =
    emb.select(col(id).cast("long").as("vec_id"),
      signLshBucket(col(vec), dim, nBits).as("bucket"))

  /** All vectors in the query's multiprobe set — the query's LSH bucket
    * plus every bucket at Hamming distance 1 (cheap multiprobe that
    * recovers most sign-flip misses) — with their exact cosine vs the
    * query. No ordering/limit: the shared candidate stage of
    * [[lshCosineTopK]] and the oracle-checked contract query.
    *
    * SCALE NOTE: this is the INDEX-FREE one-shot variant — it recomputes
    * the bucket assignment over the whole `emb` per call, which is fine
    * for a single batch pass but a full corpus scan PER QUERY. Repeated
    * queries should build [[graft.index.VectorIndex]] once (the same
    * bucket assignment persisted bucket-partitioned) and use its
    * partition-pruned `annTopK`, which reads only the ≤ nBits+1 probe
    * buckets.
    */
  def lshProbeCandidates(emb: DataFrame, id: String, vec: String, dim: Int,
      nBits: Int, query: Seq[Float]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val qdf = Seq(Tuple1(query)).toDF("qv")
      .select(signLshBucket(col("qv").cast("array<float>"), dim, nBits).as("b"))
    val qb = qdf.head().getInt(0)
    val probes = qb +: (0 until nBits).map(b => qb ^ (1 << b))
    val q = array(query.map(v => lit(v)): _*)
    emb.select(col(id).cast("long").as("vec_id"), col(vec).as("v"),
        signLshBucket(col(vec), dim, nBits).as("bucket"))
      .filter(col("bucket").isin(probes: _*))
      .select(col("vec_id"), cosine(col("v"), q).as("cos"))
  }

  /** Approximate cosine top-k: score only vectors in the multiprobe set. */
  def lshCosineTopK(emb: DataFrame, id: String, vec: String, dim: Int,
      nBits: Int, query: Seq[Float], k: Int): DataFrame =
    lshProbeCandidates(emb, id, vec, dim, nBits, query)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)

  // ---------- IVF (inverted-file) coarse-quantizer ANN ----------

  /** IVF centroids: the `nCells` corpus vectors with the smallest
    * md5("ivf:" || vec_id) — a deterministic hash-ordered sample taken in
    * ONE TakeOrderedAndProject pass (no global sort, no iterative
    * training; Lloyd rounds would sharpen centroid QUALITY but change no
    * plan shape downstream, so the sampled quantizer is the structural
    * scale path). The collect is bounded by `nCells` — the same
    * capped-driver-collect contract as the WAND UB table and the
    * per-bucket lineage rows.
    *
    * Returns `(cell, centroidVector)` with dense cell ids in hash order.
    */
  def ivfCentroids(emb: DataFrame, id: String, vec: String,
      nCells: Int): Array[(Int, Array[Float])] = {
    require(nCells > 0 && nCells <= 65536,
      "nCells bounds the centroid collect (64k cells ≈ 16 MB at dim 64)")
    val hk = Portable.md5Long(
      concat(lit("ivf:"), col(id).cast("long").cast("string")))
    emb.select(col(id).cast("long").as("cvid"), col(vec).as("cvec"), hk.as("hk"))
      .orderBy(col("hk").asc, col("cvid").asc).limit(nCells)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }
  }

  /** Lloyd (k-means) refinement of an IVF centroid sample, on cosine
    * geometry: `iters` rounds of
    *
    *  1. assign — ONE codegen'd corpus map ([[ivfCellCol]]; no join, no
    *     shuffle of corpus rows);
    *  2. per-(cell, dim) sums — `posexplode` + one partially-aggregated
    *     `groupBy(cell, pos)` whose combine state and shuffle volume are
    *     bounded by `nCells·dim` per task, never by corpus size;
    *  3. driver update of the ≤ `nCells·dim` sums (the same
    *     capped-driver-collect contract as [[ivfCentroids]], enforced by
    *     the `require` below).
    *
    * Spherical k-means: members are L2-normalized before the mean so each
    * new centroid is its cell's mean DIRECTION — the argmax-cosine
    * assignment is scale-invariant, so letting long vectors drag the
    * mean would train a different objective than the one queries use.
    * Zero-norm / wrong-dim / null-element vectors are excluded from
    * training (they carry no direction; at assignment time they fall in
    * cell 0 as always). A cell that loses all members keeps its previous
    * centroid, so cell ids stay dense and probe semantics never collapse.
    *
    * Deterministic given the input sample up to floating-point reduction
    * order (double sums; the distributed reduction order is
    * plan-dependent) — which is why the DEFAULT quantizer everywhere
    * stays the plain hash sample: oracle-gated queries need bit-stable
    * centroids. Refinement is the measured-recall upgrade
    * (BENCH.md "IVF refinement"): same plan shapes, better cells.
    */
  def kmeansRefine(emb: DataFrame, vec: String,
      cents: Array[(Int, Array[Float])], iters: Int): Array[(Int, Array[Float])] = {
    require(iters >= 0, "iters >= 0")
    if (iters == 0 || cents.isEmpty) return cents
    val nCells = cents.length
    val dim = cents.head._2.length
    require(nCells.toLong * dim <= (1L << 22),
      s"nCells*dim = ${nCells.toLong * dim} exceeds the 4M-row driver " +
        "collect cap for per-(cell,dim) sums — shrink the quantizer or " +
        "refine on a corpus sample")
    val nrm = sqrt(aggregate(col("v0"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val training = emb
      .select(col(vec).as("v0"))
      .filter(col("v0").isNotNull && size(col("v0")) === dim &&
        !exists(col("v0"), _.isNull))
      .select(col("v0"), nrm.as("n0"))
      .filter(col("n0") > 0.0d)
      .select(col("v0"), transform(col("v0"), x => x.cast("double") / col("n0")).as("unit"))
    var cur = cents
    var it = 0
    while (it < iters) {
      val rows = training
        .select(ivfCellCol(col("v0"), cur).as("cell"),
          posexplode(col("unit")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val cnt = new Array[Long](nCells)
      rows.foreach { r =>
        val c = r.getInt(0)
        sums(c)(r.getInt(1)) = r.getDouble(2)
        cnt(c) = r.getLong(3)
      }
      cur = cur.map { case (c, old) =>
        if (cnt(c) == 0L) (c, old)
        else (c, Array.tabulate(dim)(d => (sums(c)(d) / cnt(c)).toFloat))
      }
      it += 1
    }
    cur
  }

  /** Nearest-centroid cell id as a pure codegen'd column: one fused
    * argmax loop over the centroid matrix
    * ([[graft.functions.NearestCentroid]] — centroids ride the generated
    * class as a reference object, so CODE size is O(1) while the work
    * stays `nCells · dim` multiply-adds per vector). No join, no shuffle:
    * assignment is a map over the corpus. Bit-identical to
    * [[ivfCellColComposed]] (pinned by IvfSpec); the composed form's
    * generated code is O(nCells·dim) and janino rejects it at a few
    * hundred centroids.
    */
  def ivfCellCol(vec: Column, centroids: Array[(Int, Array[Float])]): Column =
    graft.functions.NearestCentroid.cellCol(vec, centroids)

  /** The composed-builtins formulation of [[ivfCellCol]] (parity reference
    * for IvfSpec): `array_max` over `struct(cosine, -cell)` entries
    * (struct ordering = highest cosine, then lowest cell). Only viable for
    * small centroid sets — generated code is O(nCells·dim).
    */
  private[graft] def ivfCellColComposed(vec: Column,
      centroids: Array[(Int, Array[Float])]): Column = {
    val entries = centroids.map { case (cid, cv) =>
      struct(cosine(vec, array(cv.toIndexedSeq.map(v => lit(v)): _*)).as("cc"),
        lit(-cid).as("negc"))
    }
    (-array_max(array(entries.toSeq: _*)).getField("negc")).cast("int")
  }

  /** Driver-side cosine with the SAME index-order double accumulation as
    * the codegen'd column path (probe-cell selection must rank centroids
    * the way the distributed plan would). Shared with
    * [[graft.index.IvfIndex]], whose probe ranking must match this one
    * exactly (parity pinned by IvfIndexSpec).
    */
  private[graft] def cosineLocal(a: Array[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Cells ranked the way the distributed assignment ranks them: cosine
    * DESC with NaN GREATEST (the [[graft.functions.NearestCentroid]] /
    * struct-max rule — Scala's default Double ordering sorts NaN LAST,
    * which would rank a zero-norm centroid's cell worst while assignment
    * sends every NaN-cosine vector INTO it), tiebreak lowest cell. The
    * query's length must match the centroid dim — [[cosineLocal]] indexes
    * by the centroid's length, so a short query would throw from the
    * middle of the loop and a long one would silently truncate.
    */
  private[graft] def rankCells(cents: Array[(Int, Array[Float])],
      query: Seq[Float]): Seq[Int] = {
    val dim = cents.head._2.length
    require(query.length == dim,
      s"query dim ${query.length} != centroid dim $dim")
    cents.map { case (cid, cv) => (cid, cosineLocal(cv, query)) }
      .sortBy { case (cid, c) =>
        (if (java.lang.Double.isNaN(c)) 0 else 1, -c, cid) }
      .map(_._1).toSeq
  }

  /** IVF candidates: vectors whose nearest centroid is one of the query's
    * `nProbe` highest-cosine cells, with exact cosine vs the query. The
    * whole plan is one narrow corpus scan — assignment ([[ivfCellCol]]) and
    * the `cell IN probes` filter are codegen'd projections, probe-cell
    * selection is driver arithmetic over the nCells-capped centroid set.
    *
    * SCALE NOTE: like [[lshProbeCandidates]] this is the INDEX-FREE
    * one-shot variant — fine for a single batch pass, a full corpus scan
    * per query otherwise. Repeated queries should persist the assignment
    * cell-partitioned (exactly the [[graft.index.VectorIndex]] pattern
    * with `cell` as the hive partition column and the centroid table in
    * the manifest): a query then reads only `nProbe` of `nCells`
    * partitions. vs sign-LSH: the quantizer ADAPTS to the data's density
    * (centroids are corpus samples, so dense regions get more cells),
    * where the hyperplane family is data-oblivious.
    */
  def ivfProbeCandidates(emb: DataFrame, id: String, vec: String,
      nCells: Int, nProbe: Int, query: Seq[Float]): DataFrame = {
    require(nProbe > 0 && nProbe <= nCells, "0 < nProbe <= nCells")
    val cents = ivfCentroids(emb, id, vec, nCells)
    val probes = rankCells(cents, query).take(nProbe)
    val q = array(query.map(v => lit(v)): _*)
    emb.select(col(id).cast("long").as("vec_id"), col(vec).as("v"),
        ivfCellCol(col(vec), cents).as("cell"))
      .filter(col("cell").isin(probes: _*))
      .select(col("vec_id"), cosine(col("v"), q).as("cos"))
  }

  /** Approximate cosine top-k over the IVF probe set. `nProbe = nCells`
    * degenerates to exact [[cosineTopK]] (parity-pinned by IvfSpec);
    * smaller `nProbe` trades scanned fraction for recall, and the probe
    * sets are NESTED in `nProbe` (same centroid ranking), so recall is
    * monotone in the knob by construction.
    */
  def ivfCosineTopK(emb: DataFrame, id: String, vec: String, nCells: Int,
      nProbe: Int, query: Seq[Float], k: Int): DataFrame =
    ivfProbeCandidates(emb, id, vec, nCells, nProbe, query)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)

  /** Embedding-cosine near-duplicate pairs: candidates share an LSH bucket
    * (self-join on bucket, capped), exact cosine filter ≥ minCos. The
    * bucket-assignment persist is owned by `scope` (see [[CacheScope]]).
    */
  def cosineNearDups(emb: DataFrame, id: String, vec: String, dim: Int,
      nBits: Int, minCos: Double, maxBucket: Int = 10000,
      scope: CacheScope = CacheScope.global): DataFrame = {
    val b = scope.cut(emb.select(col(id).cast("long").as("vec_id"),
      col(vec).as("v"), signLshBucket(col(vec), dim, nBits).as("bucket")))
    val cold = b.groupBy(col("bucket")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket && col("bsz") >= 2)
    val pruned = b.join(cold.select("bucket"), Seq("bucket"))
    pruned.as("l").join(pruned.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("id_a"), col("r.vec_id").as("id_b"),
        cosine(col("l.v"), col("r.v")).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
