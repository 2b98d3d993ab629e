package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data curation.
  *
  * `sample(fraction)` draws from a per-task RNG — different plans,
  * retries, or partition counts change the sample. Corpus curation
  * needs the opposite: a sample that is a pure function of the row's
  * identity, so re-runs, incremental loads, and other engines (the
  * oracle) select the identical subset. The selector hashes the id with
  * md5 under a salt; a row is kept when its hash bucket (mod 100) falls
  * below the stratum's percentage.
  *
  * Scale shape: a narrow filter — no shuffle, no state, fully
  * pushdown-friendly compute on top of the scan.
  */
object Sampling {

  /** Hash bucket 0..99 for an id column under a salt. 28-bit md5 prefix
    * → exact int64 (the same engine-portable trick the dedup pipeline
    * uses, see MinHashLSH.shingleHash).
    */
  def bucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 7), 16, 10)
      .cast("long") % 100

  /** Uniform pct% deterministic sample. */
  def uniform(df: DataFrame, idCol: String, salt: String, pct: Int): DataFrame =
    df.filter(bucket(col(idCol), salt) < pct)

  /** Stratified deterministic sample: per-stratum percentage with a
    * default for unlisted strata. Rates are data-independent literals →
    * a single CASE WHEN, still a narrow filter.
    */
  def stratified(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      salt: String,
      pctByStratum: Map[String, Int],
      defaultPct: Int): DataFrame = {
    val rate = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(stratumCol) === k, p).otherwise(acc)
    }
    df.filter(bucket(col(idCol), salt) < rate)
  }
}
