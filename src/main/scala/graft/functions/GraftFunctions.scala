package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** SQL surface for the engine's native expressions — registered either on
  * a live session ([[GraftFunctions.register]]) or at session build time
  * via `spark.sql.extensions=graft.functions.GraftExtensions`:
  *
  * {{{
  *   SELECT graft_dot(a.embedding, b.embedding)          -- fused dot product
  *   SELECT graft_sign_lsh(embedding, 64, 8)             -- sign-LSH bucket
  *   SELECT graft_md5_halves(shingle).h1                 -- CW minhash seeds
  * }}}
  *
  * The library itself is Dataset-first (input_hint); this is the escape
  * hatch for `spark.sql`-driven pipelines to reach the same codegen'd
  * operators instead of reimplementing them as UDFs.
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftFunctions.type].getName, null, name, usage,
      "", "", "", "", "", "", "internal")

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - fused float-vector dot product (double)"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "graft_dot(a, b)")
        DotProductFF(es(0), es(1))
      }),
    (FunctionIdentifier("graft_sign_lsh"),
      info("graft_sign_lsh", "graft_sign_lsh(vec, dim, nBits) - sign-LSH bucket id (int)"),
      (es: Seq[Expression]) => {
        require(es.length == 3, "graft_sign_lsh(vec, dim, nBits)")
        SignLsh(es(0), SignLsh.hyperplanes(
          litInt(es(1), "dim"), litInt(es(2), "nBits")))
      }),
    (FunctionIdentifier("graft_md5_halves"),
      info("graft_md5_halves", "graft_md5_halves(s) - struct<h1,h2> 56-bit digest halves"),
      (es: Seq[Expression]) => {
        require(es.length == 1, "graft_md5_halves(s)")
        Md5Halves(es(0))
      }),
    (FunctionIdentifier("graft_nearest_centroid"),
      info("graft_nearest_centroid",
        "graft_nearest_centroid(vec, centroids) - IVF cell id (int); " +
          "centroids must be a foldable array<array<float>>"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "graft_nearest_centroid(vec, centroids)")
        NearestCentroid(es(0), foldableCentroids(es(1)))
      }))

  /** Evaluate a foldable `array<array<float>>` centroid literal at plan
    * time (the matrix must be a constant — it rides the generated class as
    * a reference object, not a per-row child).
    */
  private def foldableCentroids(e: Expression): Seq[Seq[Float]] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    require(e.foldable && (e.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _ => false
    }), s"centroids must be a foldable array<array<float>>, got $e")
    val outer = e.eval(null).asInstanceOf[ArrayData]
    require(outer != null, "centroids must not be NULL")
    (0 until outer.numElements()).map { c =>
      require(!outer.isNullAt(c), s"centroid $c is NULL")
      val inner = outer.getArray(c)
      (0 until inner.numElements()).map { i =>
        // ArrayData.getFloat on a null slot silently reads 0.0f — a
        // NULL component would build the expression against a wrong
        // matrix with no error
        require(!inner.isNullAt(i), s"centroid $c component $i is NULL")
        inner.getFloat(i)
      }
    }
  }

  /** Register on a live session (idempotent — re-registration overwrites). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** `spark.sql.extensions` entry point (session-build-time injection). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (id, inf, builder) =>
      ext.injectFunction((id, inf, builder))
    }
}
