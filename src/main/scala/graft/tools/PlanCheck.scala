package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump executed-plan summaries for the contract queries: verifies filters
  * and projections reach the parquet scans (PushedFilters / ReadSchema),
  * joins pick broadcast where expected, and nothing falls out of
  * whole-stage codegen unexpectedly.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val scans = plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("PartitionFilters")).map(_.trim.take(160)).toSeq
      // partition pruning evidence survives the 160-char cut on its own line
      val pfilters = "PartitionFilters: \\[[^\\]]*\\]".r
        .findAllIn(plan).toSeq.distinct.filter(!_.contains("[]"))
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join")).map(_.trim.replaceAll("\\(.*", "").take(80)).toSeq.distinct
    val aggs = plan.linesIterator.filter(l => l.contains("Aggregate"))
        .map(_.trim.replaceAll("\\(.*", "").take(60)).toSeq
        .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }.toSeq.sorted
      println(s"== $n")
      scans.foreach(s => println(s"   scan: $s"))
      pfilters.foreach(p => println(s"   prune: ${p.take(200)}"))
      joins.foreach(j => println(s"   join: $j"))
      println(s"   aggs: ${aggs.mkString(", ")}")
    }
    spark.stop()
  }
}
