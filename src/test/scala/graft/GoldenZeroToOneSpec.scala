package graft

import graft.index.Mutations
import graft.score.ZeroToOne

/** Every zero-to-one golden vector from the reference
  * (/root/reference/src/score/default/zero_to_one.rs:129-405 and
  * /root/reference/tests/integrations_tests.rs:96-149).
  */
class GoldenZeroToOneSpec extends TestBase {

  test("partial matching (zero_to_one.rs:138-157)") {
    val idx = buildTitleIndex(Seq("abc", "abcefg", "abcefghij"))
    assertQuery(idx, "abc", ZeroToOne(),
      Seq((0L, 1.0), (1L, 0.5), (2L, 0.33333333333333337)))
  }

  test("partial matching repeating (zero_to_one.rs:159-171)") {
    val idx = buildTitleIndex(Seq("abcdef abcdefghi"))
    assertQuery(idx, "abc abc", ZeroToOne(), Seq((0L, 0.4166666666666667)))
  }

  test("penalize repeating query terms (zero_to_one.rs:173-182)") {
    val idx = buildTitleIndex(Seq("abc"))
    assertQuery(idx, "abc abc", ZeroToOne(), Seq((0L, 0.5)))
  }

  test("penalize missing repeating query terms (zero_to_one.rs:184-193)") {
    val idx = buildTitleIndex(Seq("abc abc"))
    assertQuery(idx, "abc", ZeroToOne(), Seq((0L, 0.5)))
  }

  test("bounded by one (zero_to_one.rs:194-206)") {
    val idx = buildTitleIndex(Seq("abc abc"))
    assertQuery(idx, "abc ab", ZeroToOne(), Seq((0L, 0.8333333333333334)))
  }

  test("bounded by one 2 (zero_to_one.rs:208-217)") {
    val idx = buildTitleIndex(Seq("abc ab"))
    assertQuery(idx, "abc abc", ZeroToOne(), Seq((0L, 0.5)))
  }

  test("bounded be one (zero_to_one.rs:219-231)") {
    val idx = buildTitleIndex(Seq("oy oy oysters"))
    assertQuery(idx, "oy oy oysters", ZeroToOne(), Seq((0L, 1.0)))
  }

  test("multiple results (zero_to_one.rs:233-267)") {
    val idx = buildTitleIndex(Seq(
      "abcdef", "abc abcdef", "abcdef abcdef", "abcdef abcdefghi", "def abcdef"))
    assertQuery(idx, "abc", ZeroToOne(),
      Seq((0L, 0.5), (1L, 0.5), (2L, 0.25), (3L, 0.25), (4L, 0.25)))
  }

  test("multiple results, repeated query terms (zero_to_one.rs:269-306)") {
    val idx = buildTitleIndex(Seq(
      "abcdef", "abc abcdef", "abcdef abcdef", "abcdef abcdefghi", "def abcdef"))
    assertQuery(idx, "abc abc", ZeroToOne(),
      Seq((1L, 0.75), (2L, 0.5), (3L, 0.4166666666666667), (0L, 0.25), (4L, 0.25)))
  }

  test("multi-field combine (zero_to_one.rs:308-355)") {
    val idx = buildTwoFieldIndex(Seq(
      (0L, "abc", "abc"),
      (1L, "abcefg", "abcefg"),
      (2L, "abcefghij", "abcefghij")))
    assertQuery(idx, "abc", ZeroToOne(),
      Seq((0L, 1.0), (1L, 0.5), (2L, 0.33333333333333337)))
  }

  test("multi-field combine ignores lowest (zero_to_one.rs:357-404)") {
    val idx = buildTwoFieldIndex(Seq(
      (0L, "abc", "a"),
      (1L, "abcefg", "a"),
      (2L, "abcefghij", "a")))
    assertQuery(idx, "abc", ZeroToOne(),
      Seq((0L, 1.0), (1L, 0.5), (2L, 0.33333333333333337)))
  }

  test("lifecycle with tombstones (integrations_tests.rs:96-149)") {
    val idx = buildTwoFieldIndex(Seq(
      (0L, "abc", "dfg"),
      (1L, "dfgh", "abcd")))
    assertQuery(idx, "abc", ZeroToOne(), Seq((0L, 1.0), (1L, 0.75)))
    val removed = Mutations.removeDocuments(idx, Seq(0L))
    assertQuery(removed, "abc", ZeroToOne(), Seq((1L, 0.75)))
  }
}
