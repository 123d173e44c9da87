package graft

/** The driver's smoke contract: `entry` returns rows on sf0.001, and every
  * `oracleSql` key exists in `queries`.
  */
class EntrySpec extends TestBase {
  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val qs = SparkEntry.queries.keySet
    val orphan = SparkEntry.oracleSql.keySet -- qs
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
  }

  test("every query runs and returns rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, fn) =>
      fn(spark, "/root/testdata/sf0.001").limit(1).count() == 0
    }.map(_._1)
    assert(empty.isEmpty, s"queries with no rows at sf0.001: $empty")
  }
}
