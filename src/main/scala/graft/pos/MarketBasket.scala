package graft.pos

import org.apache.spark.ml.fpm.FPGrowth
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P15/A12 — market-basket analysis (reference
  * `cumulative_report.py:122-160`): baskets per receipt → frequent
  * itemsets → association rules sorted by lift.
  *
  * The reference uses mlxtend Apriori; FP-Growth is the distributed
  * algorithm with the identical output contract (itemsets ≥ min_support;
  * rules with confidence/lift). mlxtend generates ALL rules and filters
  * on lift ≥ threshold, while FPGrowth filters on confidence natively —
  * so confidence is set to 0 and lift filtered afterwards (SURVEY §7.4.9).
  * Baskets are SETS: TransactionEncoder one-hot collapses duplicate items
  * per receipt (SURVEY §7.4.10) ⇒ collect_set.
  */
object MarketBasket {

  def baskets(df: DataFrame): DataFrame =
    df.groupBy(col("receipt_number"))
      .agg(collect_set(col("item_name")).as("items"))

  /** Association rules with mlxtend's column contract:
    * antecedents, consequents, support (joint), confidence, lift —
    * sorted by lift desc.
    */
  def rules(df: DataFrame, minSupport: Double = 0.01, minLift: Double = 0.5): DataFrame = {
    val fp = new FPGrowth()
      .setItemsCol("items")
      .setMinSupport(minSupport)
      .setMinConfidence(0.0)
    // FPGrowth.fit scans its input twice (support count + tree build);
    // uncached, each pass would re-run the basket shuffle. fit
    // materializes the frequent itemsets, so the basket cache can be
    // dropped immediately after — downstream rule generation reads only
    // the model, and leaving it pinned would accumulate across a full
    // verify/bench run.
    val b = baskets(df).cache()
    val model = try fp.fit(b) finally b.unpersist()
    model.associationRules
      .filter(col("lift") >= minLift)
      .select(
        col("antecedent").as("antecedents"),
        col("consequent").as("consequents"),
        col("support"),
        col("confidence"),
        col("lift"))
      .orderBy(col("lift").desc)
  }

  /** Frequent itemsets ≥ min_support (the Apriori half of the contract). */
  def frequentItemsets(df: DataFrame, minSupport: Double = 0.01): DataFrame = {
    val b = baskets(df).cache() // count + FPGrowth's two passes
    val n = b.count()
    val fp = new FPGrowth().setItemsCol("items").setMinSupport(minSupport)
    val model = try fp.fit(b) finally b.unpersist() // itemsets live in the model
    model.freqItemsets
      .withColumn("support", col("freq") / lit(n.toDouble))
      .select(col("items"), col("support"), col("freq"))
      .orderBy(col("support").desc)
  }
}
