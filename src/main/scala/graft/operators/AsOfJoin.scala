package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the payload of the
  * latest right row whose time is <= the left row's time, per key.
  *
  * Implemented with the union-and-fill pattern rather than a range
  * join: tag both sides, union them, sort within each key partition by
  * (time, side, tiebreaker) and carry the last-seen right payload
  * forward with `last(_, ignoreNulls)` over a running frame. This costs
  * exactly ONE shuffle on the key — same as the equi-join the data
  * needs anyway — and never materializes a time-range cross product,
  * so it scales to arbitrarily dense right sides (a SortMergeJoin on
  * `key AND rtime <= ltime` degenerates to per-key quadratic work;
  * this stays O(n log n) in the partition sort).
  *
  * Tie rules (all deterministic, replay-safe):
  *  - right row at exactly the left row's time IS visible (<=): right
  *    rows sort before left rows at equal times;
  *  - among right rows with the same (key, time), the one with the
  *    greatest tiebreaker column wins.
  */
object AsOfJoin {

  def asOfBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTimeMicros: String,
      rightTimeMicros: String,
      payload: Seq[String],
      rightTiebreaker: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // Payload travels as one struct ordered (time, tiebreaker, ...) so
    // `last` over the sorted frame picks max-(time, tiebreaker).
    val packed = struct(
      (col(rightTimeMicros).as("__at") +: col(rightTiebreaker).as("__atb")
        +: payload.map(col)): _*)
    val rightSide = right.select(
      col(key).as("__k"), col(rightTimeMicros).as("__t"),
      lit(0).as("__side"), col(rightTiebreaker).as("__tb"),
      packed.as("__asof"))
    val leftSide = left.select(
      (Seq(col(key).as("__k"), col(leftTimeMicros).as("__t"),
        lit(1).as("__side"), lit(null).cast(rightSide.schema("__tb").dataType).as("__tb"),
        lit(null).cast(rightSide.schema("__asof").dataType).as("__asof"))
        ++ leftCols.map(col)): _*)
    val unioned = rightSide
      .select((Seq("__k", "__t", "__side", "__tb", "__asof").map(col)
        ++ leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
      .unionByName(leftSide)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__filled", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    filled.select(
      (leftCols.map(col)
        ++ payload.map(p => col(s"__filled.$p").as(p))): _*)
  }
}
