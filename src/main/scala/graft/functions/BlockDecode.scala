package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.index.PostingBlocks

/** Native Catalyst expression decoding one posting block
  * (delta+varint docs, varint tf/fl streams) into
  * `array<struct<doc_id, tf, fl, occ>>` — exploded by the caller. Keeping
  * the decode at the expression level means the WAND path's survivor
  * blocks stay inside Tungsten rows end-to-end (no case-class
  * encoder round-trip as `Dataset.flatMap` would need), and the
  * subsequent explode/join/score pipeline remains one whole-stage unit
  * around this node.
  *
  * eval-based (CodegenFallback): the decode loop is byte twiddling with no
  * expression-tree fan-out, so generated-vs-interpreted makes no
  * measurable difference; the win is staying off the encoder path.
  */
case class BlockDecode(
    blockId: Expression, cnt: Expression, docsZ: Expression,
    tfsZ: Expression, flsZ: Expression,
    numFields: Int, blockSize: Long)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(blockId, cnt, docsZ, tfsZ, flsZ)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("tf", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("fl", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("occ", IntegerType, nullable = false))), containsNull = false)

  override def eval(input: InternalRow): Any = {
    val bid = blockId.eval(input).asInstanceOf[Long]
    val n = cnt.eval(input).asInstanceOf[Int]
    val docs = docsZ.eval(input).asInstanceOf[Array[Byte]]
    val tfs = tfsZ.eval(input).asInstanceOf[Array[Byte]]
    val fls = flsZ.eval(input).asInstanceOf[Array[Byte]]
    val out = new Array[Any](n)
    var dp = 0; var tp = 0; var fp = 0
    var doc = bid * blockSize
    var i = 0
    while (i < n) {
      val (delta, dp2) = PostingBlocks.readVarint(docs, dp); dp = dp2
      doc += delta
      val tf = new Array[Any](numFields); val fl = new Array[Any](numFields)
      var occ = 0; var x = 0
      while (x < numFields) {
        val (t, tp2) = PostingBlocks.readVarint(tfs, tp); tp = tp2
        val (f, fp2) = PostingBlocks.readVarint(fls, fp); fp = fp2
        tf(x) = t.toInt; fl(x) = f.toInt; occ += t.toInt
        x += 1
      }
      out(i) = InternalRow(doc, new GenericArrayData(tf), new GenericArrayData(fl), occ)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(blockId = c(0), cnt = c(1), docsZ = c(2), tfsZ = c(3), flsZ = c(4))
}

object BlockDecode {
  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  /** Column wrapper: decode + explode in the caller's select. */
  def decodeCol(blockId: Column, cnt: Column, docsZ: Column, tfsZ: Column,
      flsZ: Column, numFields: Int, blockSize: Long): Column =
    toColumn(BlockDecode(toExpression(blockId), toExpression(cnt),
      toExpression(docsZ), toExpression(tfsZ), toExpression(flsZ),
      numFields, blockSize))
}
