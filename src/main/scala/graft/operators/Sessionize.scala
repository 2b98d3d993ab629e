package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: assign a session ordinal per key, starting
  * a new session whenever the gap to the previous event exceeds
  * `gapMicros`. Batch analogue of Structured Streaming's session
  * windows (`session_window` needs event-time streaming; this is the
  * lake-side replay of the same semantics).
  *
  * One shuffle on the key; the lag + running-sum windows share a single
  * sort of each key partition, so sessionizing 100 TB of events costs
  * the same exchange a per-user aggregation would. Ordering ties on the
  * timestamp are broken by `orderCol` (a unique id) so task retries and
  * oracle comparisons are deterministic.
  */
object Sessionize {

  /** Adds `session_no` (1-based per key) to the input rows. `timeMicros`
    * must be an integer epoch-microseconds column — integer gap math is
    * exact and engine-portable, where timestamp-interval arithmetic is
    * not (sub-second precision differs across engines).
    */
  def withSessionNo(
      events: DataFrame,
      key: String,
      timeMicros: String,
      orderCol: String,
      gapMicros: Long): DataFrame = {
    val order = Window.partitionBy(col(key)).orderBy(col(timeMicros), col(orderCol))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev_t", lag(col(timeMicros), 1).over(order))
      .withColumn(
        "__new_session",
        when(col("__prev_t").isNull
          || col(timeMicros) - col("__prev_t") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("__new_session")).over(running))
      .drop("__prev_t", "__new_session")
  }

  /** Per-session stats: bounds, event count, summed value. */
  def sessionStats(
      events: DataFrame,
      key: String,
      timeMicros: String,
      orderCol: String,
      gapMicros: Long,
      valueCol: String): DataFrame =
    withSessionNo(events, key, timeMicros, orderCol, gapMicros)
      .groupBy(col(key), col("session_no"))
      .agg(
        min(col(timeMicros)).as("session_start"),
        max(col(timeMicros)).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.functions.Exprs.sumMoney(col(valueCol)).as("total_value"))
}
