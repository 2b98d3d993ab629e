package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** b1_basket_rules drift attribution (r15 verdict #1): stage-level
  * timing of the gate's three legs — basket materialization (join +
  * collect_set + cache), `FPGrowth.fit`, and the rules scan — plus the
  * knobs that govern the fit's parallelism (input partition count
  * before/after AQE coalescing, `setNumPartitions` A/B), so a wall
  * drift can be pinned to a leg and a cause instead of a vibe.
  *
  * Usage: runMain graft.tools.BasketAB [sfDir] [reps]
  */
object BasketAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](f: => A): (A, Double) = {
      val s = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - s) / 1e9)
    }

    (1 to reps).foreach { rep =>
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val baskets = graft.Tables.lineitem(spark, sfDir)
        .join(broadcast(graft.Tables.part(spark, sfDir)), $"l_partkey" === $"p_partkey")
        .groupBy($"l_orderkey")
        .agg(collect_set($"p_brand").as("items"))
        .cache()
      val (nb, tBaskets) = t(baskets.count())
      val nParts = baskets.rdd.getNumPartitions
      val fp = new org.apache.spark.ml.fpm.FPGrowth()
        .setItemsCol("items").setMinSupport(0.02).setMinConfidence(0.0)
      val (model, tFit) = t(fp.fit(baskets))
      val (nItemsets, tItemsets) = t(model.freqItemsets.count())
      val (nRules, tRules) = t(
        model.associationRules.filter($"lift" >= 0.5).count())
      baskets.unpersist()
      println(f"""{"rep":$rep,"n_baskets":$nb,"baskets_parts":$nParts,"t_baskets":$tBaskets%.2f,"t_fit":$tFit%.2f,"t_itemsets":$tItemsets%.2f,"n_itemsets":$nItemsets,"t_rules":$tRules%.2f,"n_rules":$nRules,"aqe":"$aqe","cpus":"$cpus","sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
