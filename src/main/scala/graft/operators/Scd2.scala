package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 (SCD2) history from a change log,
  * with a true INCREMENTAL merge path: `applyChanges` folds a delta
  * batch into an existing history without recomputing closed versions —
  * the CDC / MERGE shape every warehouse dimension load runs.
  *
  * Semantics: each change row (key, attrs, time) opens a new version
  * valid from its time; the previously open version closes at that
  * time (valid_to = successor's valid_from, half-open intervals). The
  * latest version per key stays open (valid_to NULL). Change order
  * within a key is (time, tiebreaker) — deterministic under equal
  * timestamps.
  *
  * Scale: `fromLog` is one shuffle on the key (lead + row_number share
  * a single window sort). `applyChanges` touches history ONLY via a
  * key-join against the delta's key set — at 100 TB that join carries
  * a broadcast-able delta key list, so closed history is never
  * rewritten, and with the history bucketed by key the merge is
  * shuffle-free on the big side. The correctness contract (proved by
  * the cdc1 gate's oracle): applyChanges(fromLog(base), delta) is
  * row-identical to fromLog(base ∪ delta) for any time-split of a log.
  */
object Scd2 {

  /** Build the full SCD2 history from a change log. Output: key, attrs,
    * version (1-based per key), valid_from, valid_to (NULL = open).
    */
  def fromLog(
      log: DataFrame,
      key: String,
      timeMicros: String,
      tiebreaker: String,
      attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(timeMicros), col(tiebreaker))
    log.select(
      (col(key) +: attrs.map(col) :+
        row_number().over(w).cast("long").as("version") :+
        col(timeMicros).as("valid_from") :+
        lead(col(timeMicros), 1).over(w).as("valid_to")): _*)
  }

  /** Merge a delta change batch into an existing history. Closed
    * versions pass through untouched; per key touched by the delta, the
    * open version closes at the delta's first change time, and the
    * delta's own versions stack on top with continued version numbers.
    */
  def applyChanges(
      history: DataFrame,
      delta: DataFrame,
      key: String,
      timeMicros: String,
      tiebreaker: String,
      attrs: Seq[String]): DataFrame = {
    val outCols = history.columns.toSeq
    // Per-key delta summary: first change instant (closes the open row)
    // — tiny relation, broadcast-able at any scale.
    val firstChange = delta
      .groupBy(col(key))
      .agg(min(col(timeMicros)).as("__first_t"))
    val closed = history
      .join(broadcast(firstChange), Seq(key), "left")
      .withColumn(
        "valid_to",
        when(col("valid_to").isNull && col("__first_t").isNotNull, col("__first_t"))
          .otherwise(col("valid_to")))
      .drop("__first_t")
    // Version offset: how many versions each key already has.
    val versionBase = history
      .groupBy(col(key))
      .agg(max(col("version")).as("__v0"))
    val deltaHist = fromLog(delta, key, timeMicros, tiebreaker, attrs)
      .join(broadcast(versionBase), Seq(key), "left")
      .withColumn("version", col("version") + coalesce(col("__v0"), lit(0L)))
      .drop("__v0")
    closed.select(outCols.map(col): _*).unionByName(deltaHist.select(outCols.map(col): _*))
  }
}
