package graft.pos

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support — the co-located join path for repeated
  * fact⋈fact joins at scale.
  *
  * A join between two tables bucketed (and sorted) on the join key with
  * the same bucket count needs NO shuffle and NO sort: each task zips
  * bucket i of both sides. At 100 TB this turns the
  * lineitem⋈orders-shaped join from the dominant shuffle into a local
  * merge — the write-once cost is amortized over every downstream join
  * (exactly the trade Hive/Spark warehouses make for their largest
  * facts).
  *
  * Bucketing requires the session catalog (`saveAsTable`); callers pick
  * the database/warehouse via the session. Spark only avoids the
  * shuffle when `spark.sql.sources.bucketing.enabled=true` (default)
  * and the bucket counts match.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketKeys: Seq[String],
      numBuckets: Int,
      sortKeys: Seq[String] = Seq.empty): Unit = {
    val sorted = if (sortKeys.isEmpty) bucketKeys else sortKeys
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the property bucketed joins buy.
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    df.collect() // finalize AQE
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
  }
}
