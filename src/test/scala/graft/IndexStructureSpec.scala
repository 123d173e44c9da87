package graft

import org.apache.spark.sql.functions._

import graft.index.Mutations
import graft.query.QueryEngine

/** Table-level invariants repurposed from the reference index-structure
  * tests (/root/reference/src/index.rs:454-785) and expansion tests
  * (/root/reference/src/query.rs:340-388), per FIXTURES.md §2f/2g.
  */
class IndexStructureSpec extends TestBase {

  test("one doc, three terms: docstats + field stats (index.rs:497-545)") {
    val idx = buildTitleIndex(Seq("a b c"))
    val ds = idx.docstats.collect()
    assert(ds.length == 1)
    assert(ds.head.getLong(0) == 0L)
    assert(ds.head.getSeq[Int](1) == Seq(3))
    val st = idx.fieldStats()
    assert(st.n == 1 && st.sums.toSeq == Seq(3L) && st.avgs.toSeq == Seq(3.0))
    // postings: three distinct terms, tf=[1] each, occ=1
    val p = idx.postings.orderBy("term").collect()
    assert(p.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(p.forall(r => r.getSeq[Int](2) == Seq(1) && r.getInt(4) == 1))
  }

  test("shared terms across docs (index.rs:547-604)") {
    val idx = buildTitleIndex(Seq("a b c", "b c d"))
    val st = idx.fieldStats()
    assert(st.n == 2 && st.sums.toSeq == Seq(6L) && st.avgs.toSeq == Seq(3.0))
    // 4 distinct terms (trie had 5 nodes incl. root; index.rs:755 analog)
    assert(idx.termdict.count() == 4)
    assert(idx.postings.count() == 6)
  }

  test("distinct term counts mirror trie node counts (index.rs:738-776)") {
    // "abc"+"abe" → 5 trie nodes (root,a,b,c,e) ↔ 2 distinct terms
    assert(buildTitleIndex(Seq("abc", "abe")).termdict.count() == 2)
    // "ab cd"+"ab ef" → 7 nodes ↔ 3 distinct terms
    assert(buildTitleIndex(Seq("ab cd", "ab ef")).termdict.count() == 3)
  }

  test("empty tokens are ignored (index.rs:606-617)") {
    val idx = buildTitleIndex(Seq("a  b")) // double space
    assert(idx.termdict.count() == 2)
    assert(idx.docstats.head().getSeq[Int](1) == Seq(2))
  }

  test("delete + vacuum empties the index (index.rs:623-658)") {
    val idx = buildTitleIndex(Seq("a"))
    val vacuumed = Mutations.vacuum(Mutations.removeDocuments(idx, Seq(0L)))
    assert(vacuumed.postings.count() == 0)
    assert(vacuumed.docstats.count() == 0)
    assert(vacuumed.termdict.count() == 0)
    val st = vacuumed.fieldStats()
    assert(st.n == 0 && st.sums.toSeq == Seq(0L) && st.avgs.head.isNaN)
  }

  test("expand_term: all prefixed terms with postings (query.rs:343-364)") {
    val idx = buildTwoFieldIndex(Seq(
      (1L, "abc", "hello world"),
      (2L, "adef", "lorem ipsum")))
    val exp = QueryEngine.expandTerm(idx, "a").collect().map(_.getString(0)).toSeq
    assert(exp == Seq("abc", "adef")) // reference returns {adef, abc} in
    // trie-DFS order; set-equal, our canonical order is lexicographic
  }

  test("expand_term: no match is empty (query.rs:366-387)") {
    val idx = buildTwoFieldIndex(Seq(
      (1L, "abc def", "hello world"),
      (2L, "adef abc", "lorem ipsum")))
    assert(QueryEngine.expandTerm(idx, "x").count() == 0)
  }

  test("occurrence-counted df (document_frequency.rs semantics)") {
    val idx = buildTitleIndex(Seq("the the the", "the cat"))
    val df = idx.termdict.filter(col("term") === "the").head().getLong(1)
    assert(df == 4L) // 4 occurrences across 2 docs — NOT countDistinct(doc)=2
  }
}
