package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pos.{Schemas, Transform}

/** §2.12 — the reference's incremental contract re-platformed on
  * Structured Streaming: a replayable raw-zone drop directory (JSONL
  * receipt documents) replaces the REST API, and checkpointing replaces
  * the JSON watermark file.
  *
  * Semantics preserved:
  *   - at-least-once ingest + read-side dedup stays the default (the
  *     lake keeps V1 as its exactly-once restore), and
  *     `dropDuplicatesWithinWatermark` offers the in-stream alternative;
  *   - `Trigger.AvailableNow` = the daily micro-batch: process whatever
  *     has arrived, then stop — exactly the Airflow daily cadence.
  *
  * Scale: file-source streaming partitions by arriving files;
  * `maxFilesPerTrigger` bounds batch size; the transform chain is the
  * same narrow `Transform.run` plan as batch (no separate code path).
  */
object StreamingIngest {

  /** Raw receipts stream from a drop directory (JSONL, schema-on-read). */
  def rawStream(spark: SparkSession, dropDir: String, maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(Schemas.rawReceipt)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dropDir)

  /** Curated append stream into the partitioned lake: raw → flatten →
    * homogenize → time slots → partitioned parquet, exactly-once via the
    * checkpoint (file-source offsets + file-sink log).
    */
  def toLake(
      spark: SparkSession,
      dropDir: String,
      lakeRoot: String,
      checkpoint: String): StreamingQuery = {
    val curated = Transform.run(rawStream(spark, dropDir))
      .withColumn("year", date_format(col("shifted_time"), "yyyy"))
      .withColumn("month", date_format(col("shifted_time"), "MM"))
    curated.writeStream
      .format("parquet")
      .option("path", lakeRoot)
      .option("checkpointLocation", checkpoint)
      .partitionBy(Schemas.partitionKeys: _*)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .start()
  }

  /** In-stream exactly-once variant: drop late duplicate receipts by
    * (receipt_number, item_name) within the event-time watermark —
    * the streaming analog of the V1 read-side window.
    */
  def dedupedStream(raw: DataFrame, watermarkDelay: String = "1 day"): DataFrame =
    Transform.run(raw)
      .withWatermark("datetime", watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("receipt_number", "item_name"))

  /** Event-time windowed revenue: tumbling window + watermark — the
    * streaming form of the time-slot aggregation (A10), for live
    * dashboards over the same curated stream.
    */
  def windowedRevenue(
      curated: DataFrame,
      window_ : String = "1 hour",
      watermarkDelay: String = "1 day"): DataFrame =
    curated
      .withWatermark("datetime", watermarkDelay)
      .groupBy(window(col("datetime"), window_))
      .agg(
        sum(col("total_money")).as("revenue"),
        approx_count_distinct(col("receipt_number")).as("approx_receipts"))
}
