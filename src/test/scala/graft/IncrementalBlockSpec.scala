package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col

import graft.index.{IndexBuilder, IndexCatalog, PostingBlocks}
import graft.query.{BlockMaxTopK, QueryEngine}
import graft.score.BM25

/** Incremental block maintenance (round-4 verdict #1): an append folds into
  * the block table by rewriting ONLY the (bucket, rg) partitions its doc-id
  * ranges touch, a vacuum compacts ONLY the rg partitions holding
  * tombstoned ids — asserted by FILE BYTE-IDENTITY across the mutation, not
  * just result parity.
  */
class IncrementalBlockSpec extends TestBase {

  private def corpus(ids: Seq[Long]) = {
    import spark.implicits._
    // multi-term docs with shared and rare terms so expansion/df/scoring
    // are non-trivial; deterministic in the id
    ids.map(i => (i, s"w${i % 7} common x${i % 13} t${i % 3} u$i"))
      .toDF("id", "body")
  }

  /** (relative path → md5) for every data file under the block dir. */
  private def blockFileHashes(root: String): Map[String, String] = {
    val base = Paths.get(s"$root/blocks")
    if (!Files.exists(base)) return Map.empty
    Files.walk(base).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("."))
      .map { p =>
        val md = MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
        base.relativize(p).toString -> md.map("%02x".format(_)).mkString
      }.toMap
  }

  private def decodeAll(root: String): org.apache.spark.sql.DataFrame = {
    val (blocks, bs, _) = IndexCatalog.readBlocks(spark, root)
    PostingBlocks.toPostings(blocks.toDF(), 1, bs)
  }

  test("append fold leaves every untouched block file byte-identical") {
    val root = Files.createTempDirectory("graft_iblk1_").toString
    IndexCatalog.build(corpus(0L until 200L), "id", Seq("body"), root, nBuckets = 4)
    // blockSize 16 × rangesPerGroup 4 = 64 docs per rg ⇒ base ids 0..199
    // span rgs 0..3; the appended ids 1000..1019 land in rg 15 only
    IndexCatalog.buildBlocks(spark, root, blockSize = 16, rangesPerGroup = 4)
    val before = blockFileHashes(root)
    assert(before.nonEmpty && before.keys.exists(_.contains("rg=3")))

    IndexCatalog.addDocuments(corpus(1000L until 1020L), "id", root)
    // between append and fold the table is refused (missing the delta)
    intercept[IllegalArgumentException] { IndexCatalog.readBlocks(spark, root) }
    IndexCatalog.buildBlocks(spark, root) // the O(delta) fold

    val after = blockFileHashes(root)
    // every pre-append file untouched, bit for bit
    before.foreach { case (rel, h) =>
      assert(after.get(rel).contains(h), s"block file $rel was rewritten by the fold")
    }
    // the delta's rg partitions exist and are the ONLY additions
    val added = after.keySet -- before.keySet
    assert(added.nonEmpty && added.forall(_.contains("rg=15")), s"added=$added")

    // the folded table is indistinguishable from the postings it encodes…
    val idx = IndexCatalog.read(spark, root)
    val back = decodeAll(root)
    assert(back.count() == idx.postings.count())
    assert(back.exceptAll(
      idx.postings.select("term", "doc_id", "tf", "fl", "occ")).count() == 0)
    // …and WAND over it matches exhaustive over a from-scratch union build
    val full = IndexBuilder.build(corpus((0L until 200L) ++ (1000L until 1020L)),
      "id", Seq("body"))
    val (blocks, bs, rpg) = IndexCatalog.readBlocks(spark, root)
    for (q <- Seq("common", "w1 x2", "u10")) {
      val wand = BlockMaxTopK.query(idx, blocks, q, BM25(), k = 10,
        blockSize = bs, rangesPerGroup = rpg)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val exact = QueryEngine.query(full, q, BM25(), limit = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(wand == exact, s"query '$q': folded=$wand vs full=$exact")
    }
  }

  test("append fold merges boundary/interleaved ranges correctly") {
    // q34-shaped append: delta ids interleave with existing ranges, so the
    // fold must MERGE old block content with the delta per (term, range)
    val root = Files.createTempDirectory("graft_iblk2_").toString
    val all = 0L until 120L
    IndexCatalog.build(corpus(all.filter(_ % 3 != 0)), "id", Seq("body"),
      root, nBuckets = 4)
    IndexCatalog.buildBlocks(spark, root, blockSize = 16, rangesPerGroup = 4)
    IndexCatalog.addDocuments(corpus(all.filter(_ % 3 == 0)), "id", root)
    IndexCatalog.buildBlocks(spark, root)

    val idx = IndexCatalog.read(spark, root)
    val back = decodeAll(root)
    assert(back.count() == idx.postings.count())
    assert(back.exceptAll(
      idx.postings.select("term", "doc_id", "tf", "fl", "occ")).count() == 0)
    // folding twice must not double anything (idempotent maintenance)
    IndexCatalog.buildBlocks(spark, root)
    assert(decodeAll(root).count() == idx.postings.count())
  }

  test("vacuum re-encodes only rg partitions containing tombstoned ids") {
    val root = Files.createTempDirectory("graft_iblk3_").toString
    IndexCatalog.build(corpus(0L until 200L), "id", Seq("body"), root, nBuckets = 4)
    IndexCatalog.buildBlocks(spark, root, blockSize = 16, rangesPerGroup = 4)
    val before = blockFileHashes(root)
    // ids 130..139 live in blocks 8 ⇒ rg 2 only
    IndexCatalog.removeDocuments(spark, root, 130L until 140L)
    IndexCatalog.vacuum(spark, root)

    val after = blockFileHashes(root)
    before.foreach { case (rel, h) =>
      if (!rel.contains("rg=2"))
        assert(after.get(rel).contains(h), s"unaffected block file $rel rewritten")
    }
    assert(before.keys.exists(k => k.contains("rg=2") &&
      !after.get(k).contains(before(k))), "no rg=2 partition was compacted")

    val idx = IndexCatalog.read(spark, root)
    val back = decodeAll(root)
    assert(back.filter(col("doc_id").between(130L, 139L)).count() == 0)
    assert(back.count() == idx.postings.count())
    assert(back.exceptAll(
      idx.postings.select("term", "doc_id", "tf", "fl", "occ")).count() == 0)
  }

  test("fold crash protocol: pending marker survives and a re-run completes") {
    val root = Files.createTempDirectory("graft_iblk4_").toString
    IndexCatalog.build(corpus(0L until 100L), "id", Seq("body"), root, nBuckets = 4)
    IndexCatalog.buildBlocks(spark, root, blockSize = 16, rangesPerGroup = 4)
    IndexCatalog.addDocuments(corpus(500L until 520L), "id", root)
    // "crash" = nothing ran after the append; the manifest must carry the
    // pending generation so readers refuse and a later fold knows its work
    val mf = java.nio.file.Files.readString(Paths.get(s"$root/manifest.json"))
    assert(mf.contains("\"blocks.pending\": \"1\""))
    intercept[IllegalArgumentException] { IndexCatalog.readBlocks(spark, root) }
    // two queued generations fold in one pass
    IndexCatalog.addDocuments(corpus(600L until 610L), "id", root)
    IndexCatalog.buildBlocks(spark, root)
    val idx = IndexCatalog.read(spark, root)
    assert(decodeAll(root).count() == idx.postings.count())
    assert(!java.nio.file.Files.readString(Paths.get(s"$root/manifest.json"))
      .contains("blocks.pending"))
  }
}
