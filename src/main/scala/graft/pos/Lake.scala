package graft.pos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K4/K5 — the partitioned parquet lake (reference `etl/load.py:52-224`).
  *
  * Layout: Hive-style `year=YYYY/month=MM` derived from `shifted_time` —
  * partition pruning makes the monthly report's two-partition read free
  * (reference relies on Athena for the same).
  *
  * Write modes mirror the reference exactly (SURVEY §2.2 K5):
  *   - [[writeFull]]       — K4 full overwrite (historical load).
  *   - [[appendIncrement]] — K5's ACTUAL behavior: append-only new rows,
  *     duplicates tolerated, exactly-once restored read-side by
  *     [[Analytics.dedupLatest]] (V1).
  *   - [[compactTo]]       — K5's INTENDED behavior as a maintenance job:
  *     dedup + rewrite with dynamic partition overwrite.
  *
  * At scale: `partitionBy(year, month)` gives writers one directory per
  * month; per-month file count follows the shuffle partitioning, so a
  * repartition on the partition keys precedes the write to avoid the
  * many-small-files explosion (each of N tasks writing M months).
  */
object Lake {

  def withPartitionKeys(df: DataFrame): DataFrame =
    df.withColumn("year", date_format(col("shifted_time"), "yyyy"))
      .withColumn("month", date_format(col("shifted_time"), "MM"))

  private def prepared(df: DataFrame): DataFrame = {
    val cols = Schemas.curatedColumns.map(col) ++ Schemas.partitionKeys.map(col)
    withPartitionKeys(df)
      .select(cols: _*)
      // One writer task per month-partition (reference writes one
      // data.parquet per month, load.py:99-103); at 100 TB this becomes
      // repartition(year, month, <salt>) to bound file size instead.
      .repartition(col("year"), col("month"))
  }

  /** K4 — schema-enforced full write, one directory per month. */
  def writeFull(df: DataFrame, root: String): Unit =
    prepared(df).write
      .partitionBy(Schemas.partitionKeys: _*)
      .mode("overwrite")
      .parquet(root)

  /** K5(a) — append-only incremental: writes ONLY the new rows
    * (reference `load.py:223` writes `monthly_data_to_add`, not the
    * merged frame); the lake stays at-least-once and V1 dedups on read.
    */
  def appendIncrement(newRows: DataFrame, root: String): Unit =
    prepared(newRows).write
      .partitionBy(Schemas.partitionKeys: _*)
      .mode("append")
      .parquet(root)

  /** Reads with an explicit schema so the Hive partition VALUES stay
    * strings: inference would turn `month=07` into int 7, and any
    * write-back (merge, compaction) would then create a DIFFERENT
    * `month=7` directory instead of overwriting the original partition.
    * The reference's Athena table also surfaces year/month as strings
    * (`monthly_report.py:61-63`).
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val withPartitions = org.apache.spark.sql.types.StructType(
      Schemas.curated.fields ++ Schemas.partitionKeys.map(k =>
        org.apache.spark.sql.types.StructField(
          k, org.apache.spark.sql.types.StringType)))
    spark.read.schema(withPartitions).parquet(root)
  }

  /** K2 — CSV snapshot sink (reference `load.py:18-28`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(path)

  /** K3 — single-object parquet sink (reference `load.py:30-47`). */
  def writeSingleParquet(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(path)

  /** S10 — watermark recovery by lake scan: max(shifted_time) of the
    * lexicographically-latest partition (reference `extract.py:254-296`).
    * Partition pruning keeps the scan to one month.
    */
  def latestWatermark(spark: SparkSession, root: String): Option[String] = {
    val lake = read(spark, root)
    // Partition columns may read back as int (type inference) — work
    // with whatever type the catalog inferred.
    val latest = lake.select(col("year"), col("month")).distinct()
      .orderBy(col("year").desc, col("month").desc).limit(1).collect()
    latest.headOption.map { r =>
      lake.filter(col("year") === r.get(0) && col("month") === r.get(1))
        .agg(date_format(max(col("shifted_time")), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
        .collect().head.getString(0)
    }
  }

  /** Deduplicated view of the lake — V1 window, newest wins. */
  def dedupView(spark: SparkSession, root: String): DataFrame =
    Analytics.dedupLatest(read(spark, root))

  /** K5(b) — compaction: rewrite only the months present in the source,
    * deduplicated, via dynamic partition overwrite.
    */
  def compactTo(spark: SparkSession, sourceRoot: String, targetRoot: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Analytics.dedupLatest(read(spark, sourceRoot))
        .repartition(col("year"), col("month"))
        .write
        .partitionBy(Schemas.partitionKeys: _*)
        .mode("overwrite")
        .parquet(targetRoot)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
