package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget MIXTURE sampling — the composition step of training-data
  * curation: given a per-domain token budget ("this run takes 500 B web
  * tokens, 80 B code, 40 B books…"), select a deterministic subset of
  * each domain whose token count fills but never exceeds its budget.
  *
  * Selection must be a pure function of row identity (the same contract
  * as [[Sampling]]): docs are ordered within their domain by the md5 of
  * their id under a salt — a deterministic shuffle every engine can
  * replay — and kept while the running token total is within budget. A
  * re-run, an incremental load, or the oracle selects the identical
  * subset; changing a budget only moves that one domain's cut line.
  *
  * Scale shape: one shuffle, on the domain key, for the per-domain
  * running sum. Domains are few and large, so the window partition is
  * the ONLY skew surface — at 100 TB the per-domain cumulative sum
  * would run as the two-pass variant (per-partition partial sums +
  * broadcast prefix offsets) but the semantics pinned here are
  * identical; the single-window form is the per-domain-shard unit of
  * that plan. Token counting is a narrow map on the scan.
  */
object MixtureSampling {

  /** Deterministic within-domain order key. */
  def orderKey(id: Column, salt: String): Column =
    md5(concat(lit(salt + ":"), id.cast("string")))

  /** Keep docs in md5 order per domain while the cumulative token count
    * stays within that domain's budget. Emits the kept rows with their
    * token count and running total (the audit columns a curation run
    * logs). Unlisted domains fall back to `defaultBudget`.
    */
  def tokenBudgetSample(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      tokensCol: String,
      salt: String,
      budgetByDomain: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    val budget = budgetByDomain.foldLeft(lit(defaultBudget)) { case (acc, (k, b)) =>
      when(col(domainCol) === k, b).otherwise(acc)
    }
    val w = Window.partitionBy(col(domainCol))
      .orderBy(orderKey(col(idCol), salt), col(idCol))
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w).cast("long"))
      .filter(col("cum_tokens") <= budget)
  }
}
