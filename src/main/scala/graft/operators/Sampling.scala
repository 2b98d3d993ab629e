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

  /** WEIGHTED sample of `n` rows WITHOUT replacement — Efraimidis &
    * Spirakis' A-ES: each row draws priority `u^(1/w)` (u uniform,
    * w its weight) and the n largest priorities are the sample, which
    * realizes exactly the sequential weighted draw (P(first pick = i)
    * = wᵢ/Σw, then renormalized without i, …) in ONE parallel pass —
    * the corpus-subsampling primitive (sample 1 B docs proportional to
    * token count) that a sequential draw cannot do distributed.
    *
    * Deterministic and engine-exact: u = (h+1)/2²⁸ from the salted
    * 28-bit md5 of the id (never a RNG), compared in log space —
    * `ln(u)` is rounded to integer MICRO-NATS first (the house log
    * discipline, NgramLm.scala), and the only further float op is one
    * integer÷integer IEEE division, correctly rounded hence
    * bit-identical on every engine; ties break on the id. The plan is
    * a narrow projection into a global top-n (TakeOrdered — never a
    * full sort): per-partition heaps of n, one n-row driver merge.
    *
    * `weightCol` must be a positive integral column (token counts,
    * byte sizes); zero/negative weights are the caller's bug — they'd
    * make `ln(u)/w` flip sign or divide by zero, so fail fast there.
    */
  /** The A-ES priority `ln(u)/w` (u hash-derived, micro-nat-rounded —
    * see [[weightedSample]]): maximizing it over rows IS the weighted
    * draw. Exposed so the streaming reservoir ranks by the identical
    * expression.
    */
  def aesPriority(id: Column, weight: Column, salt: String): Column = {
    val h = conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 7), 16, 10)
      .cast("long")
    val lnuMicro = round(log((h + 1).cast("double") / lit(268435456d)) * 1e6)
      .cast("long")
    // Fail FAST on a non-positive weight, in the expression itself (no
    // extra aggregate pass): w = 0 would yield -Infinity (silently never
    // sampled) and w < 0 flips ln(u)/w positive — that row would beat
    // every valid row and ALWAYS be sampled. Silent sample corruption,
    // so it must be a loud per-row error instead.
    when(weight <= 0,
      raise_error(concat(
        lit("Sampling.aesPriority: non-positive weight "), weight.cast("string"),
        lit(" for id "), id.cast("string"),
        lit(" — weights must be positive integers"))))
      .otherwise(lnuMicro.cast("double") / weight.cast("double"))
  }

  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      salt: String,
      n: Int): DataFrame =
    df.withColumn("__prio", aesPriority(col(idCol), col(weightCol), salt))
      .orderBy(col("__prio").desc, col(idCol))
      .limit(n)
      .drop("__prio")
}
