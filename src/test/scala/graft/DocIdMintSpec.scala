package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.{DocIdMint, SourceCodeGen}

/** (repo, path, commit) → doc_id minting: uniqueness, mapping round-trip,
  * and collision-free incremental remint.
  */
class DocIdMintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val keys = Seq("repo", "path", "commit")

  test("mint assigns unique ids; mapping resolves them back") {
    val src = SourceCodeGen.generate(spark, 500).drop("doc_id")
      .repartition(7) // multiple partitions so partition-prefixing matters
    val dir = java.nio.file.Files.createTempDirectory("graft_mint_").toString
    DocIdMint.mint(src).write.mode("overwrite").parquet(dir)
    val minted = spark.read.parquet(dir) // persisted ⇒ stable

    assert(minted.select("doc_id").distinct().count() == 500)
    val mapping = DocIdMint.mapping(minted, keys)
    // round-trip: ids → natural keys → identical (key, sha) rows
    val back = DocIdMint.resolve(minted.select("doc_id", "sha"), mapping)
    assert(back.count() == 500)
    assert(back.select((keys :+ "sha").map(col): _*)
      .exceptAll(minted.select((keys :+ "sha").map(col): _*)).count() == 0)
  }

  test("mintOrdered preserves the impact order in the id assignment") {
    val src = SourceCodeGen.generate(spark, 400).drop("doc_id")
      .withColumn("quality", pmod(xxhash64(col("path")), lit(100)))
      .repartition(7)
    val minted = DocIdMint.mintOrdered(src, Seq(col("quality").desc, col("path")))
      .select("doc_id", "quality").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // ids ascending ⇒ quality non-increasing: score-correlated keys land in
    // contiguous doc-id ranges (what block-max pruning needs)
    assert(minted.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
    assert(minted.map(_._1).distinct.length == minted.length)
  }

  test("remint keeps known ids and mints collision-free ids for new keys") {
    val src = SourceCodeGen.generate(spark, 300).drop("doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_remint_").toString
    DocIdMint.mint(src.limit(200)).write.mode("overwrite").parquet(dir)
    val mapping = DocIdMint.mapping(spark.read.parquet(dir), keys)

    val re = DocIdMint.remint(src, mapping, keys).cache()
    assert(re.count() == 300)
    assert(re.select("doc_id").distinct().count() == 300)
    // known keys keep their old ids
    val kept = re.join(mapping.withColumnRenamed("doc_id", "old_id"), keys)
    assert(kept.count() == 200 &&
      kept.filter(col("doc_id") =!= col("old_id")).count() == 0)
    // new ids sit strictly above the minted history
    val maxOld = mapping.agg(max("doc_id")).head().getLong(0)
    val fresh = re.join(mapping.select(keys.map(col): _*), keys, "left_anti")
    assert(fresh.filter(col("doc_id") <= maxOld).count() == 0)
    re.unpersist()
  }
}
