package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Md5Halves
import graft.pipeline.Portable

/** The native raw-byte digest halves must be value-identical to the
  * composed conv(substring(md5(s), 1|15, 14), 16, 10) pair — the form the
  * DuckDB oracle mirrors — on arbitrary strings (unicode, empty, long).
  */
class Md5HalvesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native md5 halves == conv/substring halves on arbitrary strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val strs: Seq[String] = Seq("", "a", "café ☕", "x" * 5000) ++
      Seq.fill(300)(rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString) :+
      null.asInstanceOf[String]
    val (c1, c2) = Portable.md5Halves(md5(col("s")))
    val rows = strs.map(Tuple1(_)).toDF("s")
      .repartition(3) // run the native eval, not constant folding
      .withColumn("_h", Md5Halves.halvesCol(col("s")))
      .select(col("_h.h1").as("nh1"), col("_h.h2").as("nh2"),
        c1.as("ch1"), c2.as("ch2"))
      .collect()
    assert(rows.length == strs.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      if (r.isNullAt(0)) assert(r.isNullAt(2), s"row $i null mismatch")
      else {
        assert(r.getLong(0) == r.getLong(2), s"row $i h1: ${r.getLong(0)} vs ${r.getLong(2)}")
        assert(r.getLong(1) == r.getLong(3), s"row $i h2: ${r.getLong(1)} vs ${r.getLong(3)}")
      }
    }
  }
}
