package graft.pos

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A8/O4 — zero-filled grouping over fixed categorical domains.
  *
  * Pandas `observed=False` over an ordered Categorical produces the full
  * cartesian of the categorical's levels with the observed values of the
  * other keys, zero-filling empty cells and silently DROPPING rows whose
  * value is outside the domain (reference `data_preparation.py:49-50`,
  * `:351-352`; semantics pinned empirically). Spark's groupBy drops empty
  * groups, so the helper rebuilds the cartesian with a broadcast join.
  */
object Domains {

  val weekdays7: Seq[String] =
    Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")

  /** The comparison report's asymmetric 6-day domain (no Monday —
    * reference `data_preparation.py:49`).
    */
  val weekdays6: Seq[String] = weekdays7.drop(1)

  /** Literal single-column domain with its ordinal sort key. */
  def domainDF(spark: SparkSession, colName: String, values: Seq[String]): DataFrame = {
    import spark.implicits._
    values.zipWithIndex.toDF(colName, s"__${colName}_ord")
  }

  /** Zero-fill `agg` over the cartesian of `domain` levels × observed
    * combinations of the remaining group keys. Rows with out-of-domain
    * values are dropped (inner semantics on the domain column). The
    * result carries a `__<domain>_ord` column for domain-ordered sorting.
    *
    * @param agg        already-aggregated frame (domain col + other keys + measures)
    * @param domainCol  the categorical column name
    * @param levels     the fixed domain
    * @param otherKeys  remaining group-key columns
    * @param fill       measure columns to zero-fill
    */
  def cartesianFill(
      agg: DataFrame,
      domainCol: String,
      levels: Seq[String],
      otherKeys: Seq[String],
      fill: Seq[String]): DataFrame = {
    val spark = agg.sparkSession
    val dom = broadcast(domainDF(spark, domainCol, levels))
    // Pandas builds the cartesian of each key's observed values
    // INDEPENDENTLY (not observed key tuples) — e.g. a category seen only
    // in July still gets zero rows for August. Cross-join per-key
    // distincts to match.
    val base = otherKeys.foldLeft(dom) { (acc, k) =>
      acc.crossJoin(agg.select(col(k)).distinct())
    }
    base
      .join(agg, domainCol +: otherKeys, "left")
      .na.fill(0L, fill)
  }
}
