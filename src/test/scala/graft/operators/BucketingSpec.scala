package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed-join contracts: the bucketed tables join with NO exchange
  * and NO sort (the pay-the-shuffle-once layout), and the result is
  * identical to the plain join.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed sorted tables join without Exchange or Sort; same result as plain join") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", -1L)
    import s2.implicits._
    val left = s2.range(1000).select(
      (col("id") % 100).as("k"), col("id").as("lv"))
    val right = s2.range(100).select(
      col("id").as("k"), (col("id") * 10).as("rv"))
    val lt = Bucketing.ensureBucketed(s2, "bspec_left", left, "k", 8)
    val rt = Bucketing.ensureBucketed(s2, "bspec_right", right, "k", 8)
    val joined = s2.table(lt).join(s2.table(rt), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    // The win: NO Exchange on either side — both scans read pre-bucketed
    // files (a per-partition Sort remains; Spark 4 does not trust bucket
    // sort metadata across files, and that sort is shuffle-free and
    // bounded by the bucket, so it is not the scale cost).
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("Bucketed: true"), plan)
    val expected = left.join(right, "k")
      .select(sum($"lv" + $"rv")).as[Long].head()
    val got = joined.select(sum($"lv" + $"rv")).as[Long].head()
    assert(got == expected)
    // idempotent: a second ensure call does not rewrite
    assert(Bucketing.ensureBucketed(s2, "bspec_left", left, "k", 8) == "bspec_left")
  }

  test("bucketed dedup aggregate runs with no Exchange on the fact side (p20 shape)") {
    val s2 = spark.newSession()
    import s2.implicits._
    // Multi-version facts: 3 rows per (receipt, item), newest wins.
    val facts = s2.range(3000).select(
      (col("id") % 500).cast("string").as("receipt_number"),
      ((col("id") / 500) % 2).cast("string").as("item_name"),
      col("id").as("shifted_time"),
      (col("id") * 2).as("price"))
    val ft = Bucketing.ensureBucketed(s2, "bspec_facts", facts, "receipt_number", 8)
    // The p19/p20 dedup: group on (receipt_number, item_name) — bucketing
    // on receipt_number alone co-locates every group, so the aggregate
    // needs no Exchange; only the downstream rollup (not built here) would.
    val dedup = s2.table(ft)
      .groupBy($"receipt_number", $"item_name")
      .agg(max_by(struct($"shifted_time", $"price"), $"shifted_time").as("w"))
    val plan = dedup.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed dedup still shuffles:\n$plan")
    assert(plan.contains("Bucketed: true"), plan)
    // Semantics-free: same winners as the shuffled aggregate on the raw df.
    val expected = facts.groupBy($"receipt_number", $"item_name")
      .agg(max_by($"price", $"shifted_time").as("p"))
      .select(sum($"p")).as[Long].head()
    assert(dedup.select(sum($"w.price")).as[Long].head() == expected)
  }

  test("REAL p20 gate plan is exchange-free on the fact side (p19 is not)") {
    // The synthetic shape test above can pass while the actual gate
    // regresses (an extra column, a lost bucket hint, a changed posify
    // projection all break bucket alignment without touching the shape
    // test) — so assert the plan of the gate the driver actually runs.
    // p20's whole reason to exist is "p19 minus the dedup shuffle": the
    // only exchanges allowed are the tiny month rollup and the output
    // orderBy; the (receipt_number, item_name) fact aggregate must ride
    // the bucketed scan.
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val p20 = graft.queries.PosQueries.p20.build(spark, d)
    val plan20 = p20.queryExecution.executedPlan.toString
    assert(plan20.contains("Bucketed: true"), plan20)
    assert(
      !plan20.contains("Exchange hashpartitioning(receipt_number"),
      s"p20's fact-side dedup aggregate shuffles — bucketing is not being used:\n$plan20")
    // Positive control: the same assert must FAIL on p19 (the shuffled
    // twin), or the substring has gone stale against Spark's plan text.
    val plan19 = graft.queries.PosQueries.p19.build(spark, d)
      .queryExecution.executedPlan.toString
    assert(
      plan19.contains("Exchange hashpartitioning(receipt_number"),
      s"plan-text probe went stale — p19 shows no receipt_number exchange:\n$plan19")
  }
}
