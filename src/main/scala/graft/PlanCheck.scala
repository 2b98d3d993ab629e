package graft

import org.apache.spark.sql.SparkSession

/** Plan diagnostics: prints formatted physical plans for representative
  * queries and greps them for the properties that matter at scale —
  * filter/column pushdown into the parquet scan, broadcast joins on
  * dims, whole-stage codegen coverage.
  *
  * Usage: runMain graft.PlanCheck [sfDir] [queryName ...]
  */
object PlanCheck {

  /** The four scale-health flags of a physical plan string — shared by
    * this tool's report and `PlanAuditSpec`, which pins them for the
    * ten most expensive gates so a plan regression flips a test
    * instead of a PLANS.md row. Note the recall-harness caveat: gates
    * whose builder composes eagerly (`.head()` bound checks) return a
    * summary DataFrame, so only the codegen flag is meaningful on
    * their FINAL plan — the scan pushdown happened in the inner
    * actions (documented in PLANS.md since round 6).
    */
  /** True when the plan contains a GLOBAL window — a `Window` operator
    * fed by an `Exchange SinglePartition` (the whole relation sorted
    * through one task: the scale-killer shape `operators/GlobalRank`
    * exists to replace). Scalar aggregates also exchange to a single
    * partition but carry no Window, so they don't trip this.
    */
  def hasSinglePartitionWindow(physical: String): Boolean = {
    def indent(l: String): Int = l.indexWhere(c => c != ' ' && c != '+' &&
      c != '-' && c != ':' && c != '*' && c != '(' && !c.isDigit && c != ')')
    val all = physical.linesIterator.toArray
    // Assign each SUBQUERY subtree its own REGION (nested subqueries
    // re-assign, so the innermost wins): a scalar subquery printed
    // beneath a Window (e.g. a runtime bloom_filter_agg injected on a
    // join below it) legitimately exchanges to a single partition — an
    // expression annotation, not the Window's data path — so its
    // exchange must never be attributed to a main-tree Window. But a
    // Window that itself LIVES inside a subquery keeps full coverage:
    // its exchange shares its region, so the check still trips.
    val region = Array.fill(all.length)(0)
    var next = 1
    var i = 0
    while (i < all.length) {
      if (all(i).contains("Subquery")) {
        val base = indent(all(i))
        val rid = next
        next += 1
        var j = i + 1
        while (j < all.length && (all(j).trim.isEmpty || indent(all(j)) > base)) {
          region(j) = rid
          j += 1
        }
      }
      i += 1
    }
    all.indices.exists { i =>
      all(i).contains("Window ") && {
        // Walk the Window operator's WHOLE subtree (until indentation
        // returns to the Window's level), not a fixed 3-line lookahead:
        // extra Project/Filter/AQE wrappers between the Window and its
        // exchange must not hide the single-partition shape from the
        // regression gate — counting only lines in the Window's own
        // region (subquery subtrees below it are separate plans).
        val base = indent(all(i))
        Iterator.range(i + 1, all.length)
          .takeWhile(j => all(j).trim.isEmpty || indent(all(j)) > base)
          .exists(j => region(j) == region(i) &&
            all(j).contains("Exchange SinglePartition"))
      }
    }
  }

  def flags(physical: String): Map[String, Boolean] = Map(
    "pushdown" -> physical.contains("PushedFilters: ["),
    "pruning" -> physical.contains("ReadSchema"),
    "broadcast" -> physical.contains("BroadcastHashJoin"),
    "codegen" -> (physical.contains("WholeStageCodegen") ||
      "\\*\\(\\d+\\)".r.findFirstIn(physical).isDefined))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("a3_pricing_summary", "j1_region_revenue", "v1_dedup_latest_event",
        "w2_regex_filter", "t1_token_stats", "e3_bucketed_knn",
        "r1_session_stats", "r2_asof_view_before_purchase", "r4_error_burst_pairs",
        "t7_tfidf_top_terms", "t8_curation_budget", "e5_ivf_knn")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      val df = SparkEntry.queries(name)(spark, sfDir)
      // collect() (not count()) so THIS QueryExecution runs and AQE
      // finalizes the inspected plan — count() builds a separate one.
      df.collect()
      val physical = df.queryExecution.executedPlan.toString()
      println(physical.linesIterator.take(40).mkString("\n"))
      val checks = flags(physical)
      println("-- checks: " + checks.map { case (k, v) => s"$k=$v" }.mkString(", "))
    }
    spark.stop()
  }
}
