package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The two 56-bit halves of md5(s) as `struct<h1: long, h2: long>`, computed
  * straight from the raw digest bytes — h1 = big-endian bytes 0–6 (hex chars
  * 1–14), h2 = bytes 7–13 (hex chars 15–28). Value-identical to the
  * composed `conv(substring(md5(s), 1|15, 14), 16, 10)` pair (Md5HalvesSpec
  * pins this) and to the DuckDB `CAST('0x' || substr(md5(s), …) AS BIGINT)`
  * oracle, but skips the hex-encode, two substring allocations, and two
  * base-16 string parses per row — on the minhash path that chain runs once
  * PER SHINGLE of the corpus.
  *
  * eval-based (CodegenFallback): the cost is the digest itself; the
  * expression-tree around it is one node, so interpreted dispatch is noise.
  * MessageDigest is not thread-safe → per-thread instance.
  */
case class Md5Halves(child: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"Md5Halves expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val md = Md5Halves.digests.get()
    md.reset()
    val d = md.digest(v.asInstanceOf[UTF8String].getBytes)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < 7) {
      h1 = (h1 << 8) | (d(i) & 0xffL)
      h2 = (h2 << 8) | (d(i + 7) & 0xffL)
      i += 1
    }
    InternalRow(h1, h2)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object Md5Halves {
  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def halvesCol(s: Column): Column = toColumn(Md5Halves(toExpression(s)))
}
