package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic `source_code` corpus in the north-star input
  * shape (BASELINE.json input_hint): `(repo, path, commit, lang, content,
  * doc_id, sha)` — generated entirely with column expressions over
  * `spark.range` (no driver-side data, no RNG state), so it scales to any
  * row count, is identical for a given (n, seed) regardless of
  * parallelism, and generation itself is distributed and codegen'd.
  *
  * Token frequencies are quadratically skewed (u² mapping of a uniform
  * hash) so the corpus has realistic stop-word-like hot terms ("import",
  * "val", …) — the build pipeline's skew handling gets exercised, not just
  * its happy path.
  */
object SourceCodeGen {

  val Keywords: Seq[String] = Seq(
    "import", "val", "def", "class", "object", "return", "if", "else",
    "for", "while", "match", "case", "trait", "new", "null", "true",
    "false", "try", "catch", "finally", "override", "private", "public",
    "static", "void", "int", "string", "let", "const", "fn", "func",
    "package", "struct", "enum", "impl", "use", "from", "self", "this")

  private val Idents: Seq[String] =
    (0 until 400).map(i => s"ident$i") ++
      (0 until 50).map(i => s"Module$i") ++
      Seq("(", ")", "{", "}", "=", "==", "=>", "->", ";", ":", ",",
        "+", "-", "*", "/", "&&", "||", "0", "1", "2", "42", "100")

  /** Full vocabulary; index 0 is hottest under the skew map. */
  val Vocab: Seq[String] = Keywords ++ Idents

  private val Langs = Seq("scala", "rust", "go", "java", "python", "c")

  /** Mix id and a stream position into a well-distributed non-negative
    * long (xxhash64 of the two columns).
    */
  private def h(cols: Column*): Column = abs(xxhash64(cols: _*))

  /** @param n     number of files
    * @param seed  corpus seed (same (n, seed) ⇒ identical table)
    * @param minTokens/maxTokens  content length range (uniform by hash)
    * @param tiered when set, every 10th doc (by hash) is BOILERPLATE —
    *               skew exponent 6 instead of the global 2, i.e.
    *               keyword-saturated the way generated/stub files are
    *               (~35% of its tokens are the hottest keyword vs ~4.4%
    *               for hand code). This doc-LEVEL score correlation is
    *               what makes impact-ordered doc-id minting
    *               (DocIdMint.mintOrdered) effective; the uniform default
    *               corpus is the measured worst case for any block-max
    *               bound (BENCH.md round 3, survivors 391/391). A
    *               CONTINUOUS tier range was tried first and rejected:
    *               BM25's tf-saturation compresses a smooth density
    *               gradient into near-equal range bounds (measured 39/64
    *               survivors); a bimodal population separates the bands.
    */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
      minTokens: Int = 20, maxTokens: Int = 140,
      tiered: Boolean = false): DataFrame = {
    val vocab = typedLit(Vocab)
    val vsz = Vocab.size
    val id = col("id")
    val nTok = (pmod(h(id, lit(seed), lit("len")), lit(maxTokens - minTokens + 1))
      + minTokens).cast("int")
    // skew: uniform u in [0,1) → index floor(u^e·V): P(idx=0) is largest,
    // long tail — stop-word-like distribution. e is the global 2, or the
    // per-doc tier exponent (larger e ⇒ more mass on hot keywords).
    val exponent: Column =
      when(pmod(h(id, lit(seed), lit("tier")), lit(10)) === 0, lit(6.0))
        .otherwise(lit(2.0))
    val tokenAt = (i: Column) => {
      val u = pmod(h(id, i, lit(seed)), lit(100000)).cast("double") / lit(100000.0)
      // u*u (not pow(u,2)) in the default path keeps the existing corpus
      // bit-identical across rounds
      val v = if (tiered) pow(u, exponent) else u * u
      element_at(vocab, (v * vsz).cast("int") + 1)
    }
    val content = concat_ws(" ", transform(sequence(lit(1), nTok), tokenAt))
    val repo = concat(lit("org/repo-"),
      lpad(pmod(h(id, lit(seed), lit("repo")), lit(997)).cast("string"), 4, "0"))
    val path = concat(lit("src/pkg"),
      pmod(h(id, lit(seed), lit("dir")), lit(64)).cast("string"),
      lit("/File"), id.cast("string"), lit(".scala"))
    spark.range(n).select(
      id.as("doc_id"),
      repo.as("repo"),
      path.as("path"),
      substring(sha2(concat(repo, lit("@"), path), 256), 1, 40).as("commit"),
      element_at(typedLit(Langs),
        pmod(h(id, lit(seed), lit("lang")), lit(Langs.size)).cast("int") + 1).as("lang"),
      content.as("content"))
      // per-row invariant column: sha256 of content, checked against any
      // downstream copy of the table (input_hint requirement)
      .withColumn("sha", sha2(col("content"), 256))
  }
}
