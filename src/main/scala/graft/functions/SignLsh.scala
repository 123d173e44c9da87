package graft.functions

import scala.collection.concurrent.TrieMap

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
  * EXACT parity with the composed formulation
  * (`Similarity.signLshBucketComposed`) and the DuckDB oracles, including
  * dirty inputs (never returns null — the composed form can't either):
  *  - null vector, vector SHORTER than dim (zip_with null-padding poisons
  *    every projection), or any null element → bucket 0;
  *  - vector LONGER than dim: the extra elements fold in with sign −1
  *    (the composed lambda's md5-of-null condition falls to
  *    `otherwise(-1.0)`);
  *  - NaN anywhere → projection NaN, and SQL `NaN > 0` is TRUE (NaN sorts
  *    greatest in both Spark and DuckDB), so the bit is SET.
  * `signs(b)(i)` must be the ±1 the composed form derives from
  * `md5("hp:b:i") & 1` ([[SignLsh.hyperplanes]]); per-b accumulation is
  * ascending i on both paths, so buckets are bit-identical. Signs are kept
  * as Seq-of-Seq so case-class equality stays structural (Catalyst
  * semanticEquals / subexpression elimination can unify two instances).
  */
case class SignLsh(vec: Expression, signs: Seq[Seq[Double]])
  extends Expression {

  private val nBits = signs.length
  private val dim = if (nBits == 0) 0 else signs.head.length
  @transient private lazy val signsArr: Array[Array[Double]] =
    signs.map(_.toArray).toArray

  override def children: Seq[Expression] = Seq(vec)
  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"SignLsh expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return 0
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < dim) return 0 // null-padding poisons every projection
    var i = 0
    while (i < n) { // any null element poisons every projection
      if (a.isNullAt(i)) return 0
      i += 1
    }
    var bucket = 0
    var b = 0
    while (b < nBits) {
      val h = signsArr(b)
      var acc = 0.0
      i = 0
      while (i < dim) {
        acc += a.getFloat(i).toDouble * h(i)
        i += 1
      }
      while (i < n) { // surplus elements: sign −1 (composed-form artifact)
        acc -= a.getFloat(i).toDouble
        i += 1
      }
      if (acc > 0 || acc.isNaN) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vec.genCode(ctx)
    val signsRef = ctx.addReferenceObj("signs", signsArr, "double[][]")
    val a = ctx.freshName("slA"); val n = ctx.freshName("slN")
    val b = ctx.freshName("slB"); val i = ctx.freshName("slI")
    val acc = ctx.freshName("slAcc"); val h = ctx.freshName("slH")
    val bad = ctx.freshName("slBad")
    val arrayData = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${vecGen.code}
      boolean ${ev.isNull} = false;
      int ${ev.value} = 0;
      if (!${vecGen.isNull}) {
        $arrayData $a = ${vecGen.value};
        int $n = $a.numElements();
        boolean $bad = ($n < ${dim});
        for (int $i = 0; $i < $n && !$bad; $i++) {
          if ($a.isNullAt($i)) $bad = true;
        }
        if (!$bad) {
          for (int $b = 0; $b < ${nBits}; $b++) {
            double[] $h = $signsRef[$b];
            double $acc = 0.0;
            for (int $i = 0; $i < ${dim}; $i++) {
              $acc += ((double) $a.getFloat($i)) * $h[$i];
            }
            for (int $i = ${dim}; $i < $n; $i++) {
              $acc -= (double) $a.getFloat($i);
            }
            if ($acc > 0 || Double.isNaN($acc)) ${ev.value} |= (1 << $b);
          }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(vec = c(0))
}

object SignLsh {
  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  private val planeCache = TrieMap.empty[(Int, Int), Seq[Seq[Double]]]

  /** Driver-side mirror of `Portable.md5Long("hp:b:i") & 1`: the exact ±1
    * hyperplane components the composed column form (and the DuckDB
    * oracles) derive — first 15 hex chars of the md5 as a 60-bit long,
    * lowest bit picks the sign. Cached per (dim, nBits): the derivation
    * runs dim·nBits digests once, not per bucketCol call.
    */
  def hyperplanes(dim: Int, nBits: Int): Seq[Seq[Double]] =
    planeCache.getOrElseUpdate((dim, nBits),
      Seq.tabulate(nBits, dim) { (b, i) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"hp:$b:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0 else -1.0
      })

  def bucketCol(vec: Column, dim: Int, nBits: Int): Column =
    toColumn(SignLsh(toExpression(vec), hyperplanes(dim, nBits)))
}
