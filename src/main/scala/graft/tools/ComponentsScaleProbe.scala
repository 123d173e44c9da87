package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Drives the DISTRIBUTED connected-components loop (hash-min label
  * propagation + pointer jumping) at a scale the driver union-find fast
  * path cannot touch, and verifies the labels against the known structure
  * (round-4 verdict #6 — the convergence claim was previously asserted
  * only at toy scale).
  *
  * Synthetic graph = the shape near-dup clustering produces, plus a
  * worst-case tail:
  *  - `nCliques` 5-cliques (10 edges each): the shallow dup clusters that
  *    dominate real near-dup graphs — expected label = min member id;
  *  - one `chainLen`-node path: diameter ≫ 1, exercising the pointer-
  *    jumping half (plain hash-min alone would need `chainLen` iterations,
  *    the combined loop O(log chainLen)).
  *
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.ComponentsScaleProbe 1000000 4096"
  *
  * 1M cliques = 10M clique edges + the chain. Prints one JSON line with
  * edges, iterations, wall seconds, and the two verification counts (both
  * must be 0).
  */
object ComponentsScaleProbe {
  def main(args: Array[String]): Unit = {
    val nCliques = if (args.nonEmpty) args(0).toLong else 1000000L
    val chainLen = if (args.length > 1) args(1).toLong else 4096L
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 5-clique edges: all 10 (i, j) pairs per clique, nodes 5c .. 5c+4
    val pairs = for (i <- 0 until 5; j <- i + 1 until 5) yield (i, j)
    val cliqueEdges = spark.range(nCliques)
      .select(explode(typedlit(pairs)).as("p"), col("id").as("c"))
      .select((col("c") * 5 + col("p._1")).as("src"),
        (col("c") * 5 + col("p._2")).as("dst"))
    // chain nodes live ABOVE the clique id space
    val base = nCliques * 5
    val chainEdges = spark.range(chainLen - 1)
      .select((col("id") + base).as("src"), (col("id") + base + 1).as("dst"))
    val edges = cliqueEdges.union(chainEdges)
    val nEdges = nCliques * 10 + (chainLen - 1)

    val t0 = System.nanoTime()
    val (labels, iters) = Dedup.componentsDistributed(edges)
    val nLabeled = labels.count() // forces the final iteration's plan
    val secs = (System.nanoTime() - t0) / 1e9

    // verification: every clique member labeled with its clique minimum,
    // every chain node with the chain head
    val badClique = labels.filter(col("id") < base)
      .filter(col("component") =!= (col("id") - col("id") % 5)).count()
    val badChain = labels.filter(col("id") >= base)
      .filter(col("component") =!= base).count()

    println(s"""{"probe":"components_scale","cliques":$nCliques,"chain_len":$chainLen,""" +
      s""""edges":$nEdges,"nodes":$nLabeled,"iterations":$iters,"secs":$secs,""" +
      s""""bad_clique_labels":$badClique,"bad_chain_labels":$badChain,"cores":"$cores"}""")
    spark.stop()
  }
}
