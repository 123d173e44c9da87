package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused float-vector dot product Σ a(i)·b(i), accumulated in double in
  * index order — a native whole-stage-codegen expression replacing the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` composition. The composed
  * form materializes an intermediate `array<double>` per row and walks
  * two lambda closures per element; this emits ONE fused loop over the
  * two Tungsten arrays (no allocation, no closure dispatch) — the
  * preference order from the design brief: native Expression with
  * doGenCode > composed higher-order functions > UDF.
  *
  * Null semantics are bit-compatible with the composed form: null input
  * array, unequal lengths (zip_with pads with null), or any null element
  * → null. Accumulation order is ascending index on both paths, so
  * results are bit-identical doubles (DotProductSpec pins this).
  */
case class DotProductFF(left: Expression, right: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"DotProductFF expects two array<float> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input); val r = right.eval(input)
    if (l == null || r == null) return null
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("dpA"); val b = ctx.freshName("dpB")
    val i = ctx.freshName("dpI"); val n = ctx.freshName("dpN")
    val acc = ctx.freshName("dpAcc"); val bad = ctx.freshName("dpBad")
    val arrayData = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${leftGen.isNull} && !${rightGen.isNull}) {
        $arrayData $a = ${leftGen.value};
        $arrayData $b = ${rightGen.value};
        int $n = $a.numElements();
        if ($b.numElements() == $n) {
          double $acc = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
          }
          if (!$bad) { ${ev.isNull} = false; ${ev.value} = $acc; }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(left = c(0), right = c(1))
}

object DotProductFF {
  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  def dotCol(a: Column, b: Column): Column =
    toColumn(DotProductFF(toExpression(a), toExpression(b)))
}
