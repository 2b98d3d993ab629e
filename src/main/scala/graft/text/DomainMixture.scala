package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Principled domain-mixture weighting — the DoReMi-adjacent step
  * (Xie et al. 2023 use learned proxy weights; production stacks
  * commonly fall back to distributional distance) that turns "how
  * unlike the trusted slice is each domain?" into per-domain token
  * budgets for the mixture sampler ([[graft.operators.MixtureSampling]]).
  *
  * Distance is add-1-smoothed unigram KL(p_domain ‖ p_target) over the
  * UNION vocabulary, kept exact-integer end-to-end: each vocabulary
  * term contributes `(c_s+1) · round(ln(p_s/p_t)·10⁶)` micro-nats
  * scaled by `N_s+V` (the smoothed denominator), so the per-domain sum
  * is order-independent and the oracle replays it bit-for-bit. Before
  * inverting, the sum is NORMALIZED back to per-token micro-nats
  * (`kl_micro = kl_scaled_micro div (N_s+V)`, still exact integer) so
  * the weight depends on distributional distance alone, not domain
  * size — unnormalized, a 10× larger domain at equal true KL scored a
  * 10× larger distance and realistic domain sizes underflowed every
  * non-target weight to zero (spec-pinned in `DomainMixtureSpec`'s
  * unequal-size case). Budget derivation stays in BIGINT arithmetic:
  * inverse weights `10¹² div (10⁶ + kl_micro)` (the 10⁶ floor — one
  * nat per token — keeps the target domain itself, KL = 0, finite)
  * normalized to the total token budget by integer division.
  *
  * Scale shape: the count tables are vocab-bounded aggregates
  * (map-side combinable), the scoring grid is |domains| × |vocab| —
  * domains broadcast over the partitioned vocab — and the final
  * relation is |domains| rows. Nothing here is corpus-sized after the
  * first groupBy; the one corpus-wide op is the token-count scan.
  */
object DomainMixture {

  /** Per-domain smoothed unigram KL vs the target domain:
    * `(source, n_toks, kl_scaled_micro, kl_micro)`, exact integers —
    * `kl_micro` is the per-token normalization (div by the smoothed
    * denominator `N_s+V`) that weight derivation uses.
    */
  def domainKl(docs: DataFrame, textCol: String, sourceCol: String,
               targetSource: String): DataFrame = {
    // ONE token-explode scan and one shuffle: the (source, tok) count
    // table is eagerly checkpointed (vocab × |domains| bounded) and
    // every other relation — per-domain totals, the vocabulary, the
    // target slice, both scalars — derives from it, so no consumer
    // re-executes the corpus scan.
    val toks = docs.select(col(sourceCol).as("source"),
      explode(split(col(textCol), " ")).as("tok"))
    val csw = toks.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val ns = csw.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val vocab = csw.select(col("tok")).distinct()
    // Bounded scalars: |vocab| and the target slice's token count.
    val v = vocab.count()
    val nt = ns.where(col("source") === targetSource).head().getLong(1)
    val ntv = nt + v
    val grid = vocab
      .crossJoin(broadcast(ns)) // domains are few; vocab stays partitioned
      .join(csw, Seq("source", "tok"), "left")
      .join(broadcast(csw.where(col("source") === targetSource)
        .select(col("tok"), col("c").as("ct"))), Seq("tok"), "left")
      .select(col("source"),
        (coalesce(col("c"), lit(0L)) + 1L).as("cs1"),
        (coalesce(col("ct"), lit(0L)) + 1L).as("ct1"),
        (col("n") + v).as("nsv"))
    grid
      .groupBy(col("source"))
      .agg(
        sum(col("cs1") *
          round(log(col("cs1").cast("double") * ntv / (col("ct1") * col("nsv"))) * 1000000d)
            .cast("long")).as("kl_scaled_micro"),
        // nsv is constant within a domain: carry it out for the
        // per-token normalization.
        max(col("nsv")).as("nsv"))
      .join(broadcast(ns.select(col("source"), col("n").as("n_toks"))), Seq("source"))
      // Clamp at 0 before the integer division: true KL is non-negative
      // but per-term micro-nat rounding could in principle drive a
      // near-target domain's sum slightly below it, where Spark's `div`
      // (truncation toward zero) and the oracle's `//` (floor) diverge
      // (0 vs -1). Both sides clamp identically; `DomainMixtureSpec`
      // asserts the sums stay non-negative so a real divergence fails
      // loudly rather than being silently clamped away.
      .select(col("source"), col("n_toks"), col("kl_scaled_micro"),
        expr("greatest(kl_scaled_micro, 0L) div nsv").as("kl_micro"))
  }

  /** KL → per-domain token budgets: inverse-KL integer weights
    * normalized to `totalBudget` tokens.
    */
  def klBudgets(docs: DataFrame, textCol: String, sourceCol: String,
                targetSource: String, totalBudget: Long): DataFrame = {
    // |domains| rows, consumed twice (sum + join): checkpoint so the
    // grid aggregation runs once.
    val kl = domainKl(docs, textCol, sourceCol, targetSource)
      .withColumn("inv_w", expr("1000000000000 div (1000000 + kl_micro)"))
      .localCheckpoint(true)
    kl.crossJoin(broadcast(kl.agg(sum(col("inv_w")).as("sum_inv"))))
      .withColumn("budget_toks", expr(s"($totalBudget * inv_w) div sum_inv"))
      .drop("sum_inv")
  }

  /** The composed mixture pass: derive budgets from domain KL, then
    * run the deterministic token-budget sampler under them. The budget
    * map collected to the driver is |domains|-bounded (the same class
    * as a codebook collect).
    */
  def klMixtureSample(docs: DataFrame, idCol: String, textCol: String,
                      sourceCol: String, targetSource: String,
                      totalBudget: Long, salt: String): DataFrame = {
    val budgets = klBudgets(docs, textCol, sourceCol, targetSource, totalBudget)
      .select(col("source"), col("budget_toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.operators.MixtureSampling.tokenBudgetSample(
      docs.select(col(idCol), col(sourceCol),
        graft.functions.Exprs.tokenCount(col(textCol)).as("n_tokens")),
      idCol, sourceCol, "n_tokens", salt, budgets, defaultBudget = 0L)
  }
}
