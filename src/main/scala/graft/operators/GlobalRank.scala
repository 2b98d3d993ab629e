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

  /** Add `rankCol` (1-based global rank under `ord`) to `df`. */
  def withGlobalRank(df: DataFrame, rankCol: String, nParts: Int,
                     ord: Column*): DataFrame = {
    val parted = df
      .repartitionByRange(nParts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // Pass 1: per-partition sizes — |partitions| rows to the driver.
    val sizes = parted.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sizes.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.init.zip(sizes).map { case ((_, off), (pid, _)) => (pid, off) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    // Pass 2: parallel per-partition rank + broadcast offset.
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    parted
      .join(offDf, Seq("__pid"))
      .withColumn(rankCol, (col("__off") + row_number().over(w)).cast("long"))
      .drop("__pid", "__off")
  }
}
