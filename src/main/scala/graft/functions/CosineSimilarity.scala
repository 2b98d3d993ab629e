package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity between two FLOAT array
  * columns, computed in double precision with a strict left-to-right
  * accumulation — bit-identical to the `zip_with`+`aggregate` fold it
  * replaces, but with whole-stage codegen (one fused loop, no
  * per-element lambda dispatch, no intermediate product array).
  *
  * This is the preference-order case (b) from the build brief: a scalar
  * op Spark's built-ins only express via interpreted higher-order
  * functions, hot on the ANN path (corpus × query-set evaluations).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def getD(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case other => throw new IllegalArgumentException(
      s"cosine_similarity: unsupported element type $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (tx, ty) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val xi = getD(x, i, tx)
      val yi = getD(y, i, ty)
      dot += xi * yi; xx += xi * xi; yy += yi * yi
      i += 1
    }
    dot / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(arr: String, idx: String, t: DataType): String = t match {
        case FloatType => s"(double) $arr.getFloat($idx)"
        case DoubleType => s"$arr.getDouble($idx)"
        case other => throw new IllegalArgumentException(
          s"cosine_similarity: unsupported element type $other")
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $xx = 0.0; double $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = ${getter(a, i, elemType(left))};
         |  double $yi = ${getter(b, i, elemType(right))};
         |  $dot += $xi * $yi; $xx += $xi * $xi; $yy += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  val name = "cosine_similarity"

  /** Install into the session's function registry (idempotent); the
    * expression is then usable from both the Column API (via
    * [[column]]) and SQL text.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")

  /** Column-level entry point; requires [[register]] on the session. */
  def column(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(name, a, b)
  }
}
