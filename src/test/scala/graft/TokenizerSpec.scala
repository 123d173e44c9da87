package graft

import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.IndexBuilder
import graft.query.QueryEngine
import graft.score.BM25

/** Tokenizer SPI (reference `Tokenizer` is caller-supplied per call,
  * /root/reference/src/lib.rs:13-14): the engine takes a column-level
  * tokenizer at build time and a matching driver-side one at query time.
  */
class TokenizerSpec extends TestBase {

  test("code tokenizer splits identifiers, numbers and punctuation") {
    import spark.implicits._
    val got = Seq("foo.bar(x) = base_2 + 0.5;")
      .toDF("t").select(Analyzer.codeTokensCol(col("t")))
      .head().getSeq[String](0)
    assert(got == Seq("foo", ".", "bar", "(", "x", ")", "=", "base_2", "+",
      "0", ".", "5", ";"))
    assert(Analyzer.codeTokenizeRaw("foo.bar(x)") ==
      Seq("foo", ".", "bar", "(", "x", ")"))
    // null text ⇒ no tokens, like the default tokenizer
    val nul = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(Analyzer.codeTokensCol(col("t"))).head().getSeq[String](0)
    assert(nul.isEmpty)
  }

  test("code-tokenized index + matching query tokenizer, punctuation term") {
    import spark.implicits._
    // "x=1" is one whitespace token but three code tokens; querying "=" can
    // only hit with the code tokenizer on both sides
    val df = Seq((0L, "let x=1 end"), (1L, "plain words only")).toDF("id", "title")
    val idx = IndexBuilder.build(df, "id", Seq("title"),
      tokenizer = Analyzer.codeTokensCol)
    val res = QueryEngine.query(idx, "=", BM25(),
      tokenizer = Analyzer.codeTokenizeRaw)
      .collect().map(_.getLong(0)).toSeq
    assert(res == Seq(0L))
    // doc 0 has 5 code tokens: let, x, =, 1, end
    assert(idx.fieldStats().sums.toSeq == Seq(8L)) // 5 + 3
  }

  test("code and whitespace tokenizers agree on punctuation-free text") {
    import spark.implicits._
    val rows = Seq((0L, "merge the data table"), (1L, "spark merge engine"),
      (2L, "data data lake"))
    val df = rows.toDF("id", "title")
    val ws = IndexBuilder.build(df, "id", Seq("title"))
    val code = IndexBuilder.build(df, "id", Seq("title"),
      tokenizer = Analyzer.codeTokensCol)
    val a = QueryEngine.query(ws, "data mer", BM25()).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = QueryEngine.query(code, "data mer", BM25(),
      tokenizer = Analyzer.codeTokenizeRaw).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b && a.nonEmpty)
  }
}
