package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream event-time interval join — the streaming
  * analog of the batch keyed range join (`operators.RangeJoin`): each
  * left event matches right events of the same key within
  * `[leftTime, leftTime + window]`.
  *
  * Both sides carry watermarks and the join condition bounds event time
  * in BOTH directions, so the state store can expire buffered rows once
  * the watermark passes `time + window` — state stays O(in-flight
  * window), not O(stream history). Without the two-sided time bound
  * Spark would (correctly) refuse to run the join in append mode: the
  * right side would need unbounded retention.
  *
  * Scale shape: both streams shuffle once on the key; per-key state is
  * a time-pruned buffer, sharded across executors like any keyed state.
  */
object StreamingJoins {

  /** Inner interval join. `left`/`right` must expose (`keyCol`,
    * `timeCol` timestamp) plus payload columns; right columns are
    * prefixed to keep the output schema collision-free.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      windowSpec: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      rightPrefix: String = "r_"): DataFrame = {
    val l = left.withWatermark(timeCol, watermarkDelay)
    val r0 = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"$rightPrefix$c")
    }
    val r = r0.withWatermark(s"$rightPrefix$timeCol", watermarkDelay)
    l.join(
      r,
      col(keyCol) === col(s"$rightPrefix$keyCol")
        && col(s"$rightPrefix$timeCol") >= col(timeCol)
        && col(s"$rightPrefix$timeCol") <= col(timeCol) + expr(s"INTERVAL $windowSpec"))
  }
}
