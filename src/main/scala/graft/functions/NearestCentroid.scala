package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused nearest-centroid cell id: argmax over cosine(vec, centroid_c)
  * (tiebreak: lowest cell), all nCells cosines computed in ONE loop over
  * the float vector against a precomputed centroid matrix (a reference
  * object in the generated code, like [[SignLsh]]'s hyperplanes).
  *
  * Replaces the composed `array_max(array(struct(cosine, -cell), ...))`
  * formulation, whose GENERATED CODE is O(nCells·dim) — janino refuses the
  * method at a few hundred centroids (measured: nCells=512, dim=64 fails
  * to compile and Spark falls back to the interpreted path corpus-wide).
  * Here code size is O(1) and the work is the same nCells·dim multiply-
  * adds, inside whole-stage codegen.
  *
  * EXACT parity with the composed formulation and the DuckDB oracles
  * (pinned by IvfSpec), including dirty inputs:
  *  - null vector, any null element, or vector length ≠ centroid dim
  *    (DotProductFF length guard) → every cosine is null → the struct max
  *    falls through to the tiebreak → cell 0;
  *  - a NaN cosine (zero-norm vector or centroid) sorts GREATEST (Spark
  *    struct ordering), ties resolve to the lowest cell — mirrored here
  *    with an explicit NaN-greatest comparison. This is the one documented
  *    DIVERGENCE from the composed form: under ANSI mode (Spark 4 default)
  *    the composed `Divide` THROWS on a zero-norm vector, while this
  *    expression keeps IEEE semantics (all-NaN → cell 0) — strictly more
  *    tolerant, never errors (IvfSpec pins both behaviors);
  *  - per-cosine accumulation is ascending index in double on both paths
  *    and the denominator is `sqrt(Σv²)·sqrt(Σc²)` with the same operand
  *    order, so cells are bit-identical.
  * Centroids are kept as Seq-of-Seq so case-class equality stays
  * structural (Catalyst semanticEquals / subexpression elimination can
  * unify two instances).
  */
case class NearestCentroid(vec: Expression, cents: Seq[Seq[Float]])
  extends Expression {

  private val nCells = cents.length
  private val dim = if (nCells == 0) 0 else cents.head.length
  require(nCells > 0, "NearestCentroid needs at least one centroid")
  require(cents.forall(_.length == dim), "ragged centroid matrix")

  @transient private lazy val centsArr: Array[Array[Float]] =
    cents.map(_.toArray).toArray
  /** sqrt(Σc²) per centroid, ascending-index double accumulation — the
    * exact value the composed form's `norm(centroidLiteral)` computes.
    */
  @transient private lazy val centNorms: Array[Double] =
    centsArr.map { cv =>
      var s = 0.0; var i = 0
      while (i < cv.length) { s += cv(i).toDouble * cv(i).toDouble; i += 1 }
      math.sqrt(s)
    }

  override def children: Seq[Expression] = Seq(vec)
  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"NearestCentroid expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return 0
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != dim) return 0
    var i = 0
    var nv = 0.0
    while (i < n) {
      if (a.isNullAt(i)) return 0
      val x = a.getFloat(i).toDouble
      nv += x * x
      i += 1
    }
    val sv = math.sqrt(nv)
    var best = Double.NegativeInfinity
    var bestNaN = false
    var bestCell = 0
    var c = 0
    while (c < nCells) {
      val cv = centsArr(c)
      var dot = 0.0
      i = 0
      while (i < dim) { dot += a.getFloat(i).toDouble * cv(i); i += 1 }
      val cos = dot / (sv * centNorms(c))
      val isNaN = java.lang.Double.isNaN(cos)
      // NaN sorts greatest; ties keep the earlier (lower) cell
      if ((isNaN && !bestNaN) || (!isNaN && !bestNaN && cos > best)) {
        best = cos; bestNaN = isNaN; bestCell = c
      }
      c += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vec.genCode(ctx)
    val centsRef = ctx.addReferenceObj("cents", centsArr, "float[][]")
    val normsRef = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    val a = ctx.freshName("ncA"); val n = ctx.freshName("ncN")
    val i = ctx.freshName("ncI"); val c = ctx.freshName("ncC")
    val nv = ctx.freshName("ncNv"); val sv = ctx.freshName("ncSv")
    val dot = ctx.freshName("ncDot"); val cos = ctx.freshName("ncCos")
    val best = ctx.freshName("ncBest"); val bestNaN = ctx.freshName("ncBestNaN")
    val bad = ctx.freshName("ncBad"); val cv = ctx.freshName("ncCv")
    val isNaN = ctx.freshName("ncIsNaN"); val x = ctx.freshName("ncX")
    val arrayData = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${vecGen.code}
      boolean ${ev.isNull} = false;
      int ${ev.value} = 0;
      if (!${vecGen.isNull}) {
        $arrayData $a = ${vecGen.value};
        int $n = $a.numElements();
        boolean $bad = ($n != ${dim});
        double $nv = 0.0;
        for (int $i = 0; $i < $n && !$bad; $i++) {
          if ($a.isNullAt($i)) { $bad = true; break; }
          double $x = (double) $a.getFloat($i);
          $nv += $x * $x;
        }
        if (!$bad) {
          double $sv = Math.sqrt($nv);
          double $best = Double.NEGATIVE_INFINITY;
          boolean $bestNaN = false;
          for (int $c = 0; $c < ${nCells}; $c++) {
            float[] $cv = $centsRef[$c];
            double $dot = 0.0;
            for (int $i = 0; $i < ${dim}; $i++) {
              $dot += ((double) $a.getFloat($i)) * ((double) $cv[$i]);
            }
            double $cos = $dot / ($sv * $normsRef[$c]);
            boolean $isNaN = Double.isNaN($cos);
            if (($isNaN && !$bestNaN) || (!$isNaN && !$bestNaN && $cos > $best)) {
              $best = $cos; $bestNaN = $isNaN; ${ev.value} = $c;
            }
          }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(vec = c(0))
}

object NearestCentroid {
  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  /** Column form over a driver-side centroid set (cell ids must be the
    * dense 0..n-1 range, which [[graft.pipeline.Similarity.ivfCentroids]]
    * guarantees — asserted here so a sparse id set fails loudly instead of
    * silently renumbering).
    */
  def cellCol(vec: Column, centroids: Array[(Int, Array[Float])]): Column = {
    require(centroids.map(_._1).toSeq == centroids.indices,
      "centroid cell ids must be dense 0..n-1 in order")
    toColumn(NearestCentroid(toExpression(vec),
      centroids.map(_._2.toIndexedSeq).toIndexedSeq))
  }
}
