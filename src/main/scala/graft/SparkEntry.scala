package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, DedupQueries, PosQueries, Query, RelQueries, SimQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is a named operator from SURVEY.md §2 expressed
  * over the driver's parquet tables; `oracleSql` holds the DuckDB-
  * equivalent SQL for the hash-compare gate (omitted only for ops SQL
  * cannot express, e.g. FP-Growth).
  */
object SparkEntry {

  val registry: Seq[Query] =
    CoreQueries.all ++ TextQueries.all ++ SimQueries.all ++ PosQueries.all ++
      DedupQueries.all ++ RelQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.regionRevenue.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
