package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused sign-LSH bucket id: bit b of the result = sign(v · h_b), all
  * nBits projections computed in ONE loop over the float vector against a
  * precomputed ±1 hyperplane matrix (a broadcast-sized reference object in
  * the generated code). Replaces nBits separate `zip_with`+`aggregate`
  * folds — nBits fewer passes and zero per-row intermediate arrays, on the
  * operator that touches EVERY embedding at ANN-build time.
  *
  * `signs(b)(i)` must be the same ±1 the composed form derives from
  * `md5("hp:b:i") & 1` ([[SignLsh.hyperplanes]]) — bucket values are
  * bit-identical (per-b accumulation is ascending i on both paths), so the
  * DuckDB oracles are unchanged. Null vector → null; null element → null
  * (multiplication with null poisons the composed fold the same way).
  * STRICT on width: a vector whose length ≠ dim returns null — wrong-width
  * data surfaces instead of silently bucketing differently than the
  * composed/oracle formulation (whose null-padding semantics at mixed
  * widths are an accident of zip_with, not a spec).
  */
case class SignLsh(vec: Expression, signs: Array[Array[Double]])
  extends Expression {

  private val nBits = signs.length
  private val dim = if (nBits == 0) 0 else signs(0).length

  override def children: Seq[Expression] = Seq(vec)
  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"SignLsh expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (nBits == 0 || n != signs(0).length) return null
    var bucket = 0
    var b = 0
    while (b < nBits) {
      val h = signs(b)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        acc += a.getFloat(i).toDouble * h(i)
        i += 1
      }
      if (acc > 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vec.genCode(ctx)
    val signsRef = ctx.addReferenceObj("signs", signs, "double[][]")
    val a = ctx.freshName("slA"); val n = ctx.freshName("slN")
    val b = ctx.freshName("slB"); val i = ctx.freshName("slI")
    val m = ctx.freshName("slM"); val acc = ctx.freshName("slAcc")
    val h = ctx.freshName("slH"); val bad = ctx.freshName("slBad")
    val bucket = ctx.freshName("slBucket")
    val arrayData = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${vecGen.code}
      boolean ${ev.isNull} = true;
      int ${ev.value} = 0;
      if (!${vecGen.isNull}) {
        $arrayData $a = ${vecGen.value};
        int $n = $a.numElements();
        int $bucket = 0;
        boolean $bad = ($n != ${dim}); // strict width: wrong-size ⇒ null
        for (int $b = 0; $b < ${nBits} && !$bad; $b++) {
          double[] $h = $signsRef[$b];
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i)) { $bad = true; break; }
            $acc += ((double) $a.getFloat($i)) * $h[$i];
          }
          if ($acc > 0) $bucket |= (1 << $b);
        }
        if (!$bad) { ${ev.isNull} = false; ${ev.value} = $bucket; }
      }
    """)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(vec = c(0))
}

object SignLsh {
  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  /** Driver-side mirror of `Portable.md5Long("hp:b:i") & 1`: the exact ±1
    * hyperplane components the composed column form (and the DuckDB
    * oracles) derive — first 15 hex chars of the md5 as a 60-bit long,
    * lowest bit picks the sign.
    */
  def hyperplanes(dim: Int, nBits: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (b, i) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hp:$b:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
    }

  def bucketCol(vec: Column, dim: Int, nBits: Int): Column =
    toColumn(SignLsh(toExpression(vec), hyperplanes(dim, nBits)))
}
