package graft

import graft.query.QueryEngine
import graft.score.{BM25, ZeroToOne}

/** Wildcard term search (q76) and per-term query boosts (q77), each pinned
  * against an independent composition: wildcard against the equivalent
  * regex/prefix queries, boosts against the w·max closed form computed from
  * single-term queries.
  */
class WildcardBoostSpec extends TestBase {

  private def results(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  // ------------------------------------------------------------- wildcard

  test("wildcardToRegex: metacharacters escaped, *? translated") {
    assert(QueryEngine.wildcardToRegex("s?a*") == "s.a.*")
    assert(QueryEngine.wildcardToRegex("*a*e") == ".*a.*e")
    assert(QueryEngine.wildcardToRegex("plain") == "plain")
    // regex metachars in the wildcard pattern are LITERAL characters
    assert(QueryEngine.wildcardToRegex("a.b") == "a\\.b")
    assert(QueryEngine.wildcardToRegex("x+y(z)") == "x\\+y\\(z\\)")
    assert(QueryEngine.wildcardToRegex("a|b") == "a\\|b")
    assert(QueryEngine.wildcardToRegex("c^d$") == "c\\^d\\$")
    assert(QueryEngine.wildcardToRegex("[k]") == "\\[k\\]")
    assert(QueryEngine.wildcardToRegex("""a\b""") == """a\\b""")
  }

  test("wildcardQuery == equivalent regexQuery; ? is exactly one char") {
    val idx = buildTitleIndex(Seq(
      "scan a", "small b", "spark c", "sat d", "sort e", "x y")).cached()
    // 's?a*': ? consumes one char, then 'a', then anything — {scan, small,
    // spark}; NOT 'sat' (a at position 2, needs position 3) and NOT 'sort'
    val got = results(QueryEngine.wildcardQuery(idx, "s?a*", BM25()))
    val expect = results(QueryEngine.regexQuery(idx, "s.a.*", BM25()))
    assert(got == expect && got.map(_._1).toSet == Set(0L, 1L, 2L))
    // leading '*' — no literal prefix to prune, still correct
    val mid = results(QueryEngine.wildcardQuery(idx, "*a?", BM25()))
    assert(mid.map(_._1).toSet ==
      results(QueryEngine.regexQuery(idx, ".*a.", BM25())).map(_._1).toSet)
    // a wildcard with no metachars is the EXACT-term query
    assert(results(QueryEngine.wildcardQuery(idx, "sat", BM25())).map(_._1)
      == Seq(3L))
    // '?' never matches empty: 'spark?' matches nothing
    assert(QueryEngine.wildcardQuery(idx, "spark?", BM25()).count() == 0)
    // collected path == over-cap scan fallback
    assert(got == results(QueryEngine.wildcardQuery(idx, "s?a*", BM25(),
      maxCollectedExpansions = 1)))
    idx.unpersist()
  }

  test("wildcard literal-character handling end-to-end") {
    // terms containing regex metachars must be matched literally
    val idx = buildTitleIndex(Seq("a.b x", "acb y", "a*b z"))
    assert(results(QueryEngine.wildcardQuery(idx, "a.b", BM25())).map(_._1)
      == Seq(0L)) // NOT 'acb' — '.' is literal in wildcard syntax
    assert(results(QueryEngine.wildcardQuery(idx, "a?b", BM25()))
      .map(_._1).toSet == Set(0L, 1L, 2L)) // '?' matches '.', 'c', '*'
  }

  // ----------------------------------------------------------- term boost

  test("parseTermBoost: syntax, literals, loud rejection") {
    assert(QueryEngine.parseTermBoost("spar^2.5") == ("spar", 2.5))
    assert(QueryEngine.parseTermBoost("key") == ("key", 1.0))
    // '^suffix' that is not a number → the token is a literal term
    assert(QueryEngine.parseTermBoost("a^b") == ("a^b", 1.0))
    assert(QueryEngine.parseTermBoost("x^") == ("x^", 1.0))
    assert(QueryEngine.parseTermBoost("^2") == ("^2", 1.0))
    // last caret wins: 'a^b^2' boosts the term 'a^b'
    assert(QueryEngine.parseTermBoost("a^b^2") == ("a^b", 2.0))
    // parseable but non-positive / non-finite weights fail loudly
    for (bad <- Seq("t^0", "t^-1", "t^-2.5", "t^Infinity"))
      intercept[IllegalArgumentException] { QueryEngine.parseTermBoost(bad) }
  }

  test("boostedQuery == Σ w·(per-slot score); all-1 weights == query") {
    val idx = buildTitleIndex(Seq(
      "spark merge key", "spar key", "merge merge key", "key spark",
      "other words")).cached()
    // closed form from single-term queries: score(doc) under "a^wa b^wb" =
    // wa·score_a(doc) + wb·score_b(doc) (each single query IS the per-slot
    // max over its expansions)
    val sa = results(QueryEngine.query(idx, "spar", BM25())).toMap
    val sb = results(QueryEngine.query(idx, "merge", BM25())).toMap
    val got = results(QueryEngine.boostedQuery(idx, "spar^2.5 merge^0.5", BM25()))
    val expect = (sa.keySet ++ sb.keySet).toSeq
      .map(d => (d, 2.5 * sa.getOrElse(d, 0.0) + 0.5 * sb.getOrElse(d, 0.0)))
      .sortBy { case (d, s) => (-s, d) }
    assertScores(got, expect)
    // weight 1.0 everywhere (explicit or implicit) == the plain query
    val plain = results(QueryEngine.query(idx, "spar merge key", BM25()))
    assert(results(QueryEngine.boostedQuery(idx, "spar merge key", BM25()))
      == plain)
    assertScores(
      results(QueryEngine.boostedQuery(idx, "spar^1.0 merge^1.0 key^1.0", BM25())),
      plain)
    idx.unpersist()
  }

  test("boost reorders ranking; zero-to-one is rejected loudly") {
    val idx = buildTitleIndex(Seq("spark a", "merge b")).cached()
    // unweighted: the two docs rank by their own BM25 scores; a big enough
    // weight on the losing term must flip the order
    val plain = results(QueryEngine.query(idx, "spark merge", BM25()))
    val boosted = results(
      QueryEngine.boostedQuery(idx, "spark merge^100", BM25()))
    assert(plain.map(_._1).toSet == boosted.map(_._1).toSet)
    assert(boosted.maxBy(_._2)._1 == 1L, "doc with the boosted term must win")
    // zero-to-one has no multiplicative expansion-boost seam
    val e = intercept[Exception] {
      QueryEngine.boostedQuery(idx, "spark^2 merge", ZeroToOne()).collect()
    }
    assert(e.getMessage.contains("eboost"))
    idx.unpersist()
  }
}
