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
  * a single window sort). `applyChanges` touches history ONLY via
  * key-joins against the delta's key set — both side relations
  * (`firstChange`, `versionBase`) are restricted to delta keys before
  * the broadcast hint, so what ships to every executor is bounded by
  * the batch size, never by dimension cardinality. Closed history is
  * never rewritten, and with the history bucketed by key the merge is
  * shuffle-free on the big side. The correctness contract (proved by
  * the cdc1 gate's oracle): applyChanges(fromLog(base), delta) is
  * row-identical to fromLog(base ∪ delta) for any time-split of a log.
  *
  * PRECONDITION of `applyChanges` (enforced, fails at execution): every
  * delta change for a key must be strictly later than that key's open
  * version's valid_from. A delta that interleaves with recorded history
  * would need closed versions rewritten — use [[applyChangesAnyOrder]],
  * which recomputes the delta-touched keys from scratch and passes every
  * untouched key through unmodified.
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
    *
    * Requires the delta to be strictly later than the open version of
    * every key it touches (the normal CDC case: batches arrive in time
    * order). Violations raise an error naming the key rather than
    * silently stacking versions out of time order — an out-of-order
    * batch closes nothing incrementally and must go through
    * [[applyChangesAnyOrder]].
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
        when(
          col("valid_to").isNull && col("__first_t").isNotNull,
          when(
            col("__first_t") <= col("valid_from"),
            raise_error(concat(
              lit("Scd2.applyChanges: out-of-order delta for key "),
              col(key).cast("string"),
              lit(" (delta starts at "), col("__first_t").cast("string"),
              lit(", open version starts at "), col("valid_from").cast("string"),
              lit("); use applyChangesAnyOrder"))).cast("long"))
            .otherwise(col("__first_t")))
          .otherwise(col("valid_to")))
      .drop("__first_t")
    // Version offset per delta key: restricted to the delta's key set
    // BEFORE aggregating, so the broadcast carries |delta keys| rows,
    // not one row per key ever recorded in the dimension.
    val versionBase = history
      .join(broadcast(delta.select(col(key)).distinct()), Seq(key), "left_semi")
      .groupBy(col(key))
      .agg(max(col("version")).as("__v0"))
    val deltaHist = fromLog(delta, key, timeMicros, tiebreaker, attrs)
      .join(broadcast(versionBase), Seq(key), "left")
      .withColumn("version", col("version") + coalesce(col("__v0"), lit(0L)))
      .drop("__v0")
    closed.select(outCols.map(col): _*).unionByName(deltaHist.select(outCols.map(col): _*))
  }

  /** General merge with NO ordering precondition: keys untouched by the
    * delta pass through unmodified (the bulk, never shuffled against the
    * delta beyond a broadcast anti-join); keys the delta touches are
    * rebuilt from scratch out of their history rows and delta rows
    * interleaved by time. At equal timestamps the rebuild orders recorded
    * history first (by its version — which preserves the original
    * (time, tiebreaker) order), then delta rows (by their tiebreaker);
    * when no history/delta rows share a timestamp the result is exactly
    * fromLog(base ∪ delta).
    */
  def applyChangesAnyOrder(
      history: DataFrame,
      delta: DataFrame,
      key: String,
      timeMicros: String,
      tiebreaker: String,
      attrs: Seq[String]): DataFrame = {
    val outCols = history.columns.toSeq
    val deltaKeys = delta.select(col(key)).distinct()
    val untouched = history.join(broadcast(deltaKeys), Seq(key), "left_anti")
    // Touched keys' history rows, replayed as log rows. Within a key the
    // version column already encodes the original (time, tiebreaker)
    // order, so it serves as the intra-history tiebreaker; __src keeps
    // history/delta tiebreakers in disjoint sort positions so their
    // types never have to be comparable.
    val histLog = history
      .join(broadcast(deltaKeys), Seq(key), "left_semi")
      .select(
        (col(key) +: attrs.map(col) :+
          col("valid_from").as(timeMicros) :+
          lit(0L).as("__src") :+
          col("version").as("__histv") :+
          lit(null).cast(delta.schema(tiebreaker).dataType).as("__tb")): _*)
    val deltaLog = delta.select(
      (col(key) +: attrs.map(col) :+
        col(timeMicros) :+
        lit(1L).as("__src") :+
        lit(null).cast("long").as("__histv") :+
        col(tiebreaker).as("__tb")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeMicros), col("__src"), col("__histv"), col("__tb"))
    val rebuilt = histLog.unionByName(deltaLog).select(
      (col(key) +: attrs.map(col) :+
        row_number().over(w).cast("long").as("version") :+
        col(timeMicros).as("valid_from") :+
        lead(col(timeMicros), 1).over(w).as("valid_to")): _*)
    untouched.select(outCols.map(col): _*).unionByName(rebuilt.select(outCols.map(col): _*))
  }
}
