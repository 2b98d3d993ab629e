package graft.streaming

import org.apache.spark.sql.SparkSession

/** The ONE state-table discipline every incremental curation stream
  * shares (NearDupStream, BudgetStream, CurationStream): a parquet
  * table PARTITIONED BY batch, claimed per micro-batch with INSERT
  * OVERWRITE so a crash-replayed batch re-derives its base from
  * `batch < id` partitions only and overwrites its own claim —
  * byte-idempotent replay.
  *
  * Durability across JVMs: the table DATA lives in the warehouse dir
  * and survives a restart even when the catalog (default in-memory)
  * does not. `ensure` therefore re-adopts an existing location instead
  * of deleting it: CREATE TABLE over the path, then `MSCK REPAIR
  * TABLE` to recover the batch partitions a previous JVM wrote — the
  * catalog-repair contract (reference `main.py:63-75`) applied to
  * streaming state. Wiping the location here would silently zero the
  * admission base while the stream checkpoint still skips completed
  * batches — the one combination that over-admits.
  */
object StateTables {

  /** Ensure `name` exists with the given column DDL (which must
    * include the `batch BIGINT` partition column last), re-adopting
    * any data a previous JVM left in the warehouse location.
    */
  def ensure(
      spark: SparkSession,
      name: String,
      columnsDdl: String,
      bucketDdl: String = ""): Unit =
    if (!spark.catalog.tableExists(name)) {
      // EXTERNAL-style (explicit LOCATION at the default warehouse
      // path): Spark refuses a MANAGED create over an existing
      // location, which is exactly the restart case we must support
      val locPath = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
      val fs = locPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(locPath)) fs.mkdirs(locPath) // fresh start: empty state dir
      val loc = locPath.toString
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS $name ($columnsDdl)
           |USING PARQUET
           |PARTITIONED BY (batch)
           |$bucketDdl
           |LOCATION '$loc'""".stripMargin)
      // recover partitions written by a previous JVM (no-op when fresh)
      spark.sql(s"MSCK REPAIR TABLE $name")
    }
}
