package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: asymmetric-distance (ADC) scoring of one
  * PQ-coded candidate against a query lookup table, as one fused codegen
  * loop — `Σ_sub lut[sub·nCodes + codes[sub]]`.
  *
  * `codes` is the candidate's packed code vector (m longs, index = sub);
  * `lut` is the query's dense distance table (m·nCodes longs, laid out
  * sub-major). Exact int64 — the loop sums the same integers the
  * (sub, code)-join + `sum(qd)` plan aggregated, so the result is
  * bit-identical while the plan sheds its dominant cost: the join used
  * to EXPLODE every (query, candidate) pair into m rows and shuffle
  * them through a hash aggregate; this is a narrow map on one row per
  * pair. At 200-query panels that join was ~13 M rows per probe width —
  * the bench's slowest band (e12/e14/e16).
  */
case class AdcLutSum(left: Expression, right: Expression, nCodes: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "adc_lut_sum"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0L
    var i = 0
    while (i < m) {
      acc += lut.getLong(i * nCodes + codes.getLong(i).toInt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $m; $i++) {
         |  $acc += $b.getLong($i * $nCodes + (int) $a.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcLutSum {

  val name = "adc_lut_sum"

  /** Install into the session's function registry (idempotent). The
    * third SQL argument is the codebook size, required foldable.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => AdcLutSum(
        exprs.head, exprs(1),
        exprs(2).eval(null).asInstanceOf[Number].intValue()),
      "built-in")

  /** Column-level entry point; requires [[register]] on the session. */
  def column(
      spark: org.apache.spark.sql.SparkSession,
      codes: Column, lut: Column, nCodes: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      name, codes, lut, org.apache.spark.sql.functions.lit(nCodes))
  }
}
