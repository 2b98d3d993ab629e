package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TWO-PASS distributed global rank — the shape every "one global
  * window" note in this repo (t24's running sum, the t33/t34 ranked
  * cuts, `MixtureSampling`'s scaladoc) promises as the 1000-executor
  * path, implemented once for real: range-partition on the order key,
  * count each partition (pass 1), broadcast the |partitions|-row
  * prefix offsets, and rank WITHIN partitions in parallel (pass 2) —
  * `offset + row_number` is the exact global rank, with no
  * single-partition window anywhere.
  *
  * The range-partitioned sorted run is eagerly checkpointed between
  * the passes: pass 2's offsets are only valid for pass 1's exact
  * partitioning, so the run must be materialized once and ranked from
  * storage (at 100 TB this is the sorted staging write a real
  * two-pass job does anyway — the checkpoint is the local-mode stand-in
  * for that lake write, and it also makes the operator immune to
  * range-sampler nondeterminism across jobs).
  *
  * The order must be TOTAL (pass a tie-breaking id last) or ranks
  * within equal keys are partition-placement-dependent.
  */
object GlobalRank {

  /** Shared two-pass core: range-partition + sort on `ord`, checkpoint
    * the run, collect one `agg` row per partition, broadcast the
    * exclusive prefix of those values, and hand the caller the
    * checkpointed run with `__pid`/`__off` columns to finish within
    * partitions in parallel.
    */
  private def prefixed(df: DataFrame, nParts: Int, agg: Column,
                       ord: Seq[Column]): (DataFrame, Long) = {
    val parted = df
      .repartitionByRange(nParts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // Pass 1: per-partition totals — |partitions| rows to the driver.
    val sizes = parted.groupBy(col("__pid")).agg(agg.as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sizes.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.init.zip(sizes).map { case ((_, off), (pid, _)) => (pid, off) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    (parted.join(offDf, Seq("__pid")), sizes.map(_._2).sum)
  }

  /** Add `rankCol` (1-based global rank under `ord`) to `df`, and
    * return the total row count (already known from pass 1 — callers
    * deriving rank-relative cuts like NTILE need it and should not pay
    * another corpus action for it).
    */
  def withGlobalRankCounted(df: DataFrame, rankCol: String, nParts: Int,
                            ord: Column*): (DataFrame, Long) = {
    val (run, total) = prefixed(df, nParts, coalesce(count(lit(1)), lit(0L)), ord)
    // Pass 2: parallel per-partition rank + broadcast offset.
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    (run
      .withColumn(rankCol, (col("__off") + row_number().over(w)).cast("long"))
      .drop("__pid", "__off"), total)
  }

  /** Add `rankCol` (1-based global rank under `ord`) to `df`. */
  def withGlobalRank(df: DataFrame, rankCol: String, nParts: Int,
                     ord: Column*): DataFrame =
    withGlobalRankCounted(df, rankCol, nParts, ord: _*)._1

  /** Add `ntileCol` — exactly SQL `NTILE(n) OVER (ORDER BY ord)` (the
    * first `total mod n` buckets get the extra row) — via the two-pass
    * rank: no single-partition window. `ord` must be total.
    */
  def withGlobalNtile(df: DataFrame, ntileCol: String, n: Int, nParts: Int,
                      ord: Column*): DataFrame = {
    val (ranked, total) = withGlobalRankCounted(df, "__grk", nParts, ord: _*)
    val base = total / n
    val rem = total % n
    val cut = rem * (base + 1) // ranks <= cut fall in the wide buckets
    val rk = col("__grk")
    // Integer division via floor: Column./ is double division; the
    // quotients here are < n, so floor is exact far beyond any corpus.
    ranked
      .withColumn(ntileCol,
        when(rk <= cut, floor((rk - 1) / (base + 1)) + 1)
          .otherwise(lit(rem) + floor((rk - 1 - cut) / lit(math.max(base, 1L))) + 1)
          .cast("long"))
      .drop("__grk")
  }

  /** Add `sumCol` — the inclusive running sum of `value` in global
    * `ord` order (≡ `SUM(value) OVER (ORDER BY ord)` under a total
    * order) — with the same two-pass shape: per-partition value totals
    * to the driver, broadcast exclusive prefix, parallel within-
    * partition running sums.
    */
  def withGlobalPrefixSum(df: DataFrame, sumCol: String, value: Column,
                          nParts: Int, ord: Column*): DataFrame = {
    val (run, _) = prefixed(df, nParts,
      coalesce(sum(value.cast("long")), lit(0L)), ord)
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run
      .withColumn(sumCol, (col("__off") + sum(value.cast("long")).over(w)).cast("long"))
      .drop("__pid", "__off")
  }
}
