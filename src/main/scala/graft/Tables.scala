package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. At cluster scale the
  * same names would resolve to partitioned/bucketed lake roots; all query
  * code goes through these accessors so the storage layout can change
  * without touching operators.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS), TIMESTAMP(MICROS)
    * and (from `tools/ScaleUp`) raw BIGINT nanos across testdata
    * generations, so dispatch on the loaded dtype instead of assuming one:
    *   - LongType (NANOS via the legacy flag, or ScaleUp's BIGINT output):
    *     rebuild a microsecond timestamp via exact integer division —
    *     truncation is order-preserving and no query emits raw nanos;
    *   - TIMESTAMP_NTZ (how plain timestamp[us] loads by default): cast to
    *     TimestampType — numerically a no-op under the UTC session TZ, and
    *     it keeps every downstream query and oracle on the one dtype;
    *   - TimestampType: pass through.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // The nanos flag is SCOPED to the relation-creation call: it is read
    // during schema inference only — once the DataFrame exists with its
    // resolved schema, actions succeed with the flag restored (verified
    // on Spark 4.1.2 against a hand-written TIMESTAMP(NANOS) file;
    // `TablesNanosSpec` pins it). A sticky session-global set here would
    // silently leak into any OTHER reader of genuinely-nanos parquet in
    // the same session. Set-and-restore rather than a per-read option
    // because the parquet source resolves this key from the session conf
    // only — `.option(...)` variants are ignored at inference time
    // (verified empirically, same fixture).
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(nanosKey)
    spark.conf.set(nanosKey, "true")
    val df =
      try table(spark, d, "events")
      finally prev match {
        case Some(v) => spark.conf.set(nanosKey, v)
        case None => spark.conf.unset(nanosKey)
      }
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
