package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline. All
  * narrow (no shuffle): per-row column expressions over the text column,
  * fully codegen'd, so they scale linearly with input splits.
  */
object TextStats {

  /** Default English stopword markers (small, deterministic). */
  val StopWords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "by", "at", "this", "that")

  /** Per-doc token counts: whitespace tokens and "BPE-ish" regex tokens
    * (letter runs / digit runs / single punctuation marks — the usual
    * pre-tokenizer shape).
    */
  def tokenCounts(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).cast("long").as("doc_id"),
      size(Portable.tokens(col(text))).as("ws_tokens"),
      size(regexp_extract_all(col(text),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("re_tokens"))

  /** Per-doc quality signals + a deterministic composite score in micro
    * units: token count band, mean token length band, stopword ratio,
    * alphabetic character ratio.
    */
  def qualityScores(docs: DataFrame, id: String, text: String,
      stopwords: Seq[String] = StopWords): DataFrame = {
    val t = Portable.tokens(col(text))
    val nTok = size(t).cast("double")
    val sumLen = aggregate(t, lit(0L), (acc, x) => acc + octet_length(x))
      .cast("double")
    val stopHits = size(filter(t, x => x.isin(stopwords.map(lit): _*)))
      .cast("double")
    val alpha = size(regexp_extract_all(col(text), lit("[A-Za-z]"), lit(0)))
      .cast("double")
    val chars = octet_length(col(text)).cast("double")
    docs.select(
      col(id).cast("long").as("doc_id"),
      nTok.cast("long").as("n_tokens"),
      when(nTok > 0, sumLen / nTok).otherwise(lit(0.0)).as("mean_tok_len"),
      when(nTok > 0, stopHits / nTok).otherwise(lit(0.0)).as("stopword_ratio"),
      when(chars > 0, alpha / chars).otherwise(lit(0.0)).as("alpha_ratio"))
      .withColumn("quality",
        // bounded [0,1]: length band × (stopwords present but not dominant)
        // × alphabetic density — a simple, fully-deterministic composite
        least(col("n_tokens").cast("double") / lit(20.0), lit(1.0)) *
          (lit(1.0) - abs(col("stopword_ratio") - lit(0.1))) *
          col("alpha_ratio"))
  }

  /** N-gram/stopword-heuristic language ID: score each candidate language
    * by its marker-word hit ratio; emit argmax with deterministic
    * (score desc, lang asc) tiebreak. Markers are a pluggable map.
    */
  def languageId(docs: DataFrame, id: String, text: String,
      markers: Map[String, Seq[String]] = DefaultLangMarkers): DataFrame = {
    val t = Portable.tokens(col(text))
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val ratio = size(filter(t, x => x.isin(words.map(lit): _*))).cast("double") /
        greatest(size(t), lit(1)).cast("double")
      // negated ratio first so an ASC struct sort = (ratio desc, lang asc)
      struct((-ratio).as("nr"), lit(lang).as("lang"), ratio.as("hit_ratio"))
    }
    docs.select(col(id).cast("long").as("doc_id"),
      sort_array(array(scored: _*)).as("_s"))
      .select(col("doc_id"),
        col("_s")(0).getField("lang").as("lang_pred"),
        col("_s")(0).getField("hit_ratio").as("hit_ratio"))
  }

  /** lang → marker words. Tiny on purpose: a real deployment swaps in
    * per-language frequency tables; the operator shape (scores → argmax)
    * is what matters.
    */
  val DefaultLangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"))

  /** Intra-document repetition signals — the Gopher-family quality rules
    * (duplicate-line fraction; most-frequent word-bigram coverage) that a
    * training-data pipeline filters boilerplate and degenerate generations
    * with. Both are ROW-LOCAL: lines and bigrams never leave their row, so
    * the operator is one narrow codegen'd pass (no explode, no shuffle,
    * O(tokens·log tokens) per doc from the sort) and scales with input
    * splits like the other TextStats.
    *
    *  - `n_lines` / `dup_line_frac`: non-empty `\n`-lines; fraction that
    *    are repeats of an earlier line = (total − distinct) / total.
    *  - `top_bigram_n` / `top_bigram_frac`: occurrences of the most
    *    frequent token bigram; as a fraction of the n−1 bigram slots
    *    (∈ [0, 1]). The max count comes from a sort + one linear fold for
    *    the longest equal-adjacent run — not the quadratic
    *    count-each-distinct-in-array formulation, which melts on long docs.
    */
  def repetitionStats(docs: DataFrame, id: String, text: String): DataFrame = {
    val arrs = docs.select(col(id).cast("long").as("doc_id"),
      filter(split(col(text), "\n"), l => l =!= "").as("ls"),
      Portable.tokens(col(text)).as("toks"))
    val nl = size(col("ls"))
    val dupFrac = when(nl > 0,
      (nl - size(array_distinct(col("ls")))).cast("double") / nl.cast("double"))
      .otherwise(lit(0.0))
    val n = size(col("toks"))
    val w = greatest(n - 1, lit(0))
    val bg = zip_with(slice(col("toks"), lit(1), w),
      slice(col("toks"), lit(2), w), (a, b) => concat_ws(" ", a, b))
    val best = aggregate(sort_array(bg),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    arrs.select(col("doc_id"),
      nl.cast("long").as("n_lines"),
      dupFrac.as("dup_line_frac"),
      best.as("top_bigram_n"),
      when(n >= 2, best.cast("double") / w.cast("double"))
        .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** Redaction patterns — deliberately in the regex dialect subset shared
    * by java.util.regex and RE2 (no backrefs, no lookaround), so the same
    * pattern string runs in Spark's codegen'd `regexp_replace` and in any
    * RE2-based oracle/engine.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** PII / contact scrubbing — the redaction pass every training-data
    * pipeline runs before anything ships: URLs, email addresses and IPv4
    * literals are replaced with typed placeholder tokens, with per-doc
    * match counts for filtering/reporting. One narrow codegen'd pass, no
    * shuffle; counts are taken on the ORIGINAL text, and the rewrite is
    * ordered URL → email → IP so an address inside a URL is redacted with
    * its URL.
    */
  def redactPii(docs: DataFrame, id: String, text: String): DataFrame = {
    val t = col(text)
    val clean =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, UrlRe, "<URL>"),
          EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>")
    docs.select(col(id).cast("long").as("doc_id"),
      size(regexp_extract_all(t, lit(UrlRe), lit(0))).cast("long").as("n_urls"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      clean.as("text_clean"))
  }

  /** Deterministic document fingerprint: md5 over the normalized text
    * (lower-cased, whitespace collapsed) — the exact-dedup key.
    */
  def fingerprints(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).cast("long").as("doc_id"),
      md5(regexp_replace(trim(lower(col(text))), "\\s+", " ")).as("fingerprint"))

  /** Polynomial ROLLING-hash fingerprint over the token stream:
    * h = fold(tokens, 0, (acc, t) → (acc·31 + hash(t) mod P) mod P) with
    * P = 2³¹−1 — order-sensitive (unlike a content hash, permuted docs
    * differ), incremental, and small enough to stay exact in BIGINT math
    * in any engine. One narrow pass, codegen'd `aggregate`.
    */
  def rollingFingerprints(docs: DataFrame, id: String, text: String): DataFrame = {
    val P = 2147483647L
    val toks = Portable.tokens(col(text))
    val hashed = transform(toks, t => Portable.md5Long(t) % P)
    docs.select(col(id).cast("long").as("doc_id"),
      aggregate(hashed, lit(0L), (acc, h) => (acc * 31L + h) % P).as("rollhash"))
  }
}
