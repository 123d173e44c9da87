package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.IndexCatalog
import graft.query.QueryEngine
import graft.score.BM25

/** Vocabulary-scale evidence for the persisted fuzzy deletion-variant
  * table (round-5 feature): the brute fuzzy path runs `levenshtein`
  * against EVERY dictionary term per query (O(vocab)); the SymSpell table
  * turns that into O(len(q)) partition-pruned point lookups. The bench
  * corpus's ~510-term vocabulary can't show that, so this probe builds an
  * index whose vocabulary SCALES: `nDocs` docs × 20 globally-unique tokens
  * ⇒ 20·nDocs distinct terms (the corpus is small; the dictionary is the
  * object under test — numeric tokens give every query term a natural
  * multi-candidate edit neighborhood, e.g. per-digit substitutions).
  *
  * Methodology per BENCH.md: one untimed warm pass per path (codegen/JIT),
  * then 5 timed reps each, medians with all samples disclosed.
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.FuzzyProbe 50000"
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 50000L
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = s"/tmp/graft_fuzzyprobe_$nDocs"
    val p = new org.apache.hadoop.fs.Path(root)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsys.exists(new org.apache.hadoop.fs.Path(s"$root/fuzzydict"))) {
      fsys.delete(p, true)
      val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 20).map(j =>
          concat(lit("tkn"), (col("id") * 20 + lit(j)).cast("string"))): _*)
          .as("text"))
      var t0 = System.nanoTime()
      IndexCatalog.build(docs, "doc_id", Seq("text"), root)
      println(f"build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      t0 = System.nanoTime()
      IndexCatalog.buildFuzzy(spark, root)
      println(f"buildFuzzy: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val idx = IndexCatalog.read(spark, root).cached()
    val m = IndexCatalog.manifest(spark, root)
    println(s"vocab=${m("stage.termdict.rows")} variants=${m("stage.fuzzydict.rows")}")

    // query terms spread across the id range; each has a real edit
    // neighborhood (digit substitutions / deletions among numeric tokens)
    val queries = Seq("tkn12345", s"tkn${nDocs * 10}", "tkn999", "tkn100100")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def js(xs: Seq[Double]) = xs.map(t => f"$t%.3f").mkString("[", ",", "]")

    for (q <- queries) {
      // result parity first (the probe is worthless if the paths diverge)
      val brute = QueryEngine.query(idx, q, BM25(), limit = 10, maxEdits = 1)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val table = QueryEngine.queryFuzzyPersisted(idx, root, q, BM25(), limit = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      require(brute == table, s"path divergence on '$q'")
      val bs = (1 to 5).map(_ => time(
        QueryEngine.query(idx, q, BM25(), limit = 10, maxEdits = 1).collect()))
      val ts = (1 to 5).map(_ => time(
        QueryEngine.queryFuzzyPersisted(idx, root, q, BM25(), limit = 10).collect()))
      println(f"q='$q' matches=${brute.size} " +
        f"brute_med=${med(bs)}%.3f s ${js(bs)} " +
        f"table_med=${med(ts)}%.3f s ${js(ts)}")
    }
    spark.stop()
  }
}
