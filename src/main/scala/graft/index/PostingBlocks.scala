package graft.index

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Compressed posting blocks (north_star requirement): per (term, fixed
  * global doc-id range), the sorted doc list is delta-encoded and
  * varint-packed, with per-block max-tf metadata for block-max WAND
  * pruning.
  *
  * Blocks use GLOBAL doc-id ranges (`block_id = doc_id / blockSize`) rather
  * than per-list counts: (a) the groupBy key (term, block_id) bounds every
  * group at `blockSize` docs, so a stop-word term with 10^10 postings
  * splits structurally across ranges — the skew cap IS the block layout,
  * no salting pass needed; (b) ranges align ACROSS terms, so a per-range
  * score upper bound can be summed over query terms
  * ([[graft.query.BlockMaxTopK]]).
  */
object PostingBlocks {

  /** `max_tf(x)` / `min_fl(x)` are the per-field block-max metadata:
    * max term frequency over the block's entries, and min field length over
    * entries whose tf(x) > 0 (0 when no entry matches in field x). Because
    * the BM25 tf-norm is increasing in tf and decreasing in fl, the pair
    * bounds every entry's field contribution: tfn(tf_e, fl_e) ≤
    * tfn(max_tf, min_fl) for tf_e > 0, and = 0 otherwise — a strictly
    * tighter (and still sound) bound than the fl-free tfn⁺ limit.
    */
  final case class Block(
      term: String, block_id: Long, cnt: Int, min_doc: Long, max_doc: Long,
      max_tf: Seq[Int], min_fl: Seq[Int], docs_z: Array[Byte],
      tfs_z: Array[Byte], fls_z: Array[Byte])

  final case class Decoded(term: String, doc_id: Long, tf: Seq[Int],
      fl: Seq[Int], occ: Int)

  val DefaultBlockSize: Long = 4096L

  // ---- ULEB128 varint ----

  def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    require(v >= 0, s"varint must be non-negative, got $v")
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** Reads a varint at `pos`; returns (value, nextPos). */
  def readVarint(buf: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var p = pos
    while ({
      val b = buf(p); p += 1
      v |= (b & 0x7fL) << shift; shift += 7
      (b & 0x80) != 0
    }) ()
    (v, p)
  }

  /** Encode one (term, block) group. `entries` must be sorted by doc_id
    * and all fall in [block_id*blockSize, (block_id+1)*blockSize).
    */
  def encode(term: String, blockId: Long, blockSize: Long,
      entries: Seq[(Long, Seq[Int], Seq[Int])], nf: Int): Block = {
    val docs = new ByteArrayOutputStream()
    val tfs = new ByteArrayOutputStream()
    val fls = new ByteArrayOutputStream()
    val maxTf = Array.fill(nf)(0)
    val minFl = Array.fill(nf)(Int.MaxValue)
    var prev = blockId * blockSize
    entries.foreach { case (d, tf, fl) =>
      writeVarint(docs, d - prev); prev = d
      var x = 0
      while (x < nf) {
        writeVarint(tfs, tf(x).toLong); writeVarint(fls, fl(x).toLong)
        if (tf(x) > maxTf(x)) maxTf(x) = tf(x)
        // min fl over MATCHING entries only (tf=0 entries score 0 in this
        // field and must not tighten its bound)
        if (tf(x) > 0 && fl(x) < minFl(x)) minFl(x) = fl(x)
        x += 1
      }
    }
    var x = 0
    while (x < nf) { if (minFl(x) == Int.MaxValue) minFl(x) = 0; x += 1 }
    Block(term, blockId, entries.size, entries.head._1, entries.last._1,
      maxTf.toSeq, minFl.toSeq, docs.toByteArray, tfs.toByteArray,
      fls.toByteArray)
  }

  def decode(b: Block, blockSize: Long, nf: Int): Iterator[Decoded] = {
    var dp = 0; var tp = 0; var fp = 0
    var doc = b.block_id * blockSize
    (0 until b.cnt).iterator.map { _ =>
      val (delta, dp2) = readVarint(b.docs_z, dp); dp = dp2
      doc += delta
      val tf = new Array[Int](nf); val fl = new Array[Int](nf)
      var x = 0; var occ = 0
      while (x < nf) {
        val (t, tp2) = readVarint(b.tfs_z, tp); tp = tp2
        val (f, fp2) = readVarint(b.fls_z, fp); fp = fp2
        tf(x) = t.toInt; fl(x) = f.toInt; occ += t.toInt
        x += 1
      }
      Decoded(b.term, doc, tf.toSeq, fl.toSeq, occ)
    }
  }

  /** Build the block table from a postings DataFrame. One shuffle on
    * (term, block_id); per-group memory is bounded by blockSize.
    */
  def fromPostings(postings: DataFrame, numFields: Int,
      blockSize: Long = DefaultBlockSize): Dataset[Block] = {
    val spark = postings.sparkSession
    import spark.implicits._
    val nf = numFields
    postings.select(col("term"), col("doc_id"), col("tf"), col("fl"))
      .as[(String, Long, Seq[Int], Seq[Int])]
      .groupByKey(r => (r._1, r._2 / blockSize))
      .mapGroups { (key: (String, Long), it: Iterator[(String, Long, Seq[Int], Seq[Int])]) =>
        val entries = it.map(r => (r._2, r._3, r._4)).toIndexedSeq.sortBy(_._1)
        encode(key._1, key._2, blockSize, entries, nf)
      }
  }

  /** Expand a block table back to posting rows (schema-compatible with the
    * postings table, plus whatever pruning already ran on the block side).
    * Decode runs as a native expression ([[graft.functions.BlockDecode]])
    * + builtin explode, so rows never leave Tungsten format (a
    * `Dataset.flatMap` would pay the case-class encoder round trip).
    */
  def toPostings(blocks: DataFrame, numFields: Int,
      blockSize: Long = DefaultBlockSize): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode}
    blocks
      .select(col("term"), explode(graft.functions.BlockDecode.decodeCol(
        col("block_id"), col("cnt"), col("docs_z"), col("tfs_z"), col("fls_z"),
        numFields, blockSize)).as("p"))
      .select(col("term"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"),
        col("p.fl").as("fl"), col("p.occ").as("occ"))
  }
}
