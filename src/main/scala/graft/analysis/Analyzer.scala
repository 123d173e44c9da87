package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization matching the reference's default whitespace tokenizer.
  *
  * The reference tokenizer is `s.split(' ')` (Rust `str::split` on a single
  * space, keeping empty segments; see /root/reference/src/lib.rs:42-44) and
  * the index/query layers then drop empty tokens
  * (/root/reference/src/index.rs:100-101, /root/reference/src/query.rs:35).
  *
  * Query-side, the raw token count (INCLUDING empties) feeds
  * `query_terms_len` (/root/reference/src/query.rs:32), which zero-to-one
  * scoring consumes — so [[tokenizeRaw]] keeps empties and callers filter.
  */
object Analyzer {

  /** Driver-side tokenize: single-space split, empties kept (Rust parity:
    * `"a  b".split(' ')` = ["a","","b"], and a trailing space yields a
    * trailing empty token).
    */
  def tokenizeRaw(s: String): IndexedSeq[String] =
    s.split(" ", -1).toIndexedSeq

  /** Driver-side tokenize with empty tokens removed. */
  def tokenize(s: String): IndexedSeq[String] =
    tokenizeRaw(s).filter(_.nonEmpty)

  /** Column-level tokenize: array of non-empty tokens of a text column.
    * Pure builtin expressions (`split` + higher-order `filter`) so the
    * whole thing stays inside whole-stage codegen. Null text ⇒ no tokens.
    */
  def tokensCol(text: Column): Column =
    filter(split(coalesce(text, lit("")), " ", -1), t => t =!= lit(""))

  // ---- pluggable tokenizers (reference `Tokenizer` is caller-supplied,
  // /root/reference/src/lib.rs:13-14; the engine must not hardcode one) ----

  /** Code-aware token pattern: identifiers (with `_`), integer literals,
    * and each punctuation mark as its own token — what a source-code corpus
    * needs (`foo.bar(x)` → foo, ., bar, (, x, )). Never emits empties.
    */
  val CodeTokenPattern = "[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[^A-Za-z0-9_\\s]"
  private val CodeTokenRegex = CodeTokenPattern.r

  /** Column-level code tokenizer — builtin `regexp_extract_all`, stays in
    * whole-stage codegen like [[tokensCol]]. Pass to `IndexBuilder.build`.
    */
  def codeTokensCol(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(CodeTokenPattern), lit(0))

  /** Driver-side code tokenizer for query strings (same pattern as
    * [[codeTokensCol]]; produces no empty tokens, so raw == filtered).
    */
  def codeTokenizeRaw(s: String): IndexedSeq[String] =
    CodeTokenRegex.findAllIn(s).toIndexedSeq

  /** UTF-8 byte length of a string column. The reference uses Rust
    * `str::len` (bytes, not chars) in both scorers' length math
    * (/root/reference/src/score/default/bm25.rs:51-52,
    * zero_to_one.rs:57-58); Spark's `length` counts characters, so this
    * must be `octet_length` for non-ASCII parity.
    */
  def byteLen(c: Column): Column = octet_length(c)
}
