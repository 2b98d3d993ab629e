package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Exprs._

/** Relational battery: one named query per operator family from
  * SURVEY.md §2 (A=aggregation, V=window, C=conditional, W=filter,
  * F/G=flatten-generate, O=sort/set), expressed over the driver's
  * TPC-H-ish tables so the DuckDB oracle can verify them.
  *
  * Scale notes (100 TB thinking): every query here groups/joins on its
  * natural key so the shuffle is the minimum one; dimension tables
  * (part/nation/region/customer at TPC-H proportions) are broadcast
  * explicitly; aggregates are all map-side-combinable (sum/count/min/max
  * over decimal or long). No query collects to the driver.
  */
object CoreQueries {

  /** A1/O1/O2 — top-K by count (reference `data_preparation.py:9-33`). */
  val topParts = Query(
    "a1_top_parts",
    """SELECT l_partkey, COUNT(*) AS cnt
      |FROM lineitem
      |GROUP BY l_partkey
      |ORDER BY cnt DESC, l_partkey
      |LIMIT 5""".stripMargin) { (spark, d) =>
    import spark.implicits._
    lineitem(spark, d)
      .groupBy($"l_partkey")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"l_partkey")
      .limit(5)
  }

  /** A2 — count-distinct per group, the reference's core "traffic" metric
    * (`data_preparation.py:71-74`), plus an exact money sum, over a
    * fact⋈dim join with the dimension broadcast.
    */
  val segmentOrders = Query(
    "a2_segment_orders",
    """SELECT c_mktsegment,
      |       COUNT(DISTINCT o_orderkey) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, d) =>
    import spark.implicits._
    orders(spark, d)
      .join(broadcast(customer(spark, d)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        countDistinct($"o_orderkey").as("n_orders"),
        sumMoney($"o_totalprice").as("revenue"))
      .orderBy($"c_mktsegment")
  }

  /** A3/A4-shape — pricing summary (grouped sums over base and derived
    * money, reference A3 `data_preparation.py:390-393`). TPC-H Q1 shape:
    * fully map-side-combinable, single shuffle on the 6-value group key.
    */
  val pricingSummary = Query(
    "a3_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       SUM(l_quantity) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |       COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, d) =>
    import spark.implicits._
    lineitem(spark, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        sumMoney($"l_extendedprice").as("sum_base_price"),
        sumDerived($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** A4 — global KPI row (reference `cumulative_report.py:39-56`): one
    * full-table aggregate, derived scalar computed from exact parts.
    */
  val globalKpis = Query(
    "a4_global_kpis",
    """SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
      |       COUNT(DISTINCT o_orderkey) AS n_orders,
      |       strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
      |       strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_day,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(DISTINCT o_orderkey) AS avg_order_value
      |FROM orders""".stripMargin) { (spark, d) =>
    import spark.implicits._
    orders(spark, d)
      .agg(
        sumMoney($"o_totalprice").as("total_revenue"),
        countDistinct($"o_orderkey").as("n_orders"),
        date_format(min($"o_orderdate"), "yyyy-MM-dd").as("first_day"),
        date_format(max($"o_orderdate"), "yyyy-MM-dd").as("last_day"))
      .withColumn("avg_order_value", $"total_revenue" / $"n_orders")
  }

  /** A5 — two-level aggregate: average monthly revenue (reference
    * `cumulative_report.py:45`). Exact decimal at both levels; the final
    * division is a deterministic double op on identical operands.
    */
  val avgMonthlyRevenue = Query(
    "a5_avg_monthly_revenue",
    """SELECT CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_monthly_revenue
      |FROM (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM orders GROUP BY 1
      |)""".stripMargin) { (spark, d) =>
    import spark.implicits._
    orders(spark, d)
      .groupBy(monthKey($"o_orderdate").as("month"))
      .agg(sumMoney($"o_totalprice").as("rev"))
      .agg((sumMoney($"rev") / count(lit(1))).as("avg_monthly_revenue"))
  }

  /** A9 — pivot long→wide with zero fill (reference
    * `monthly_report.py:237-238`): explicit pivot value list for plan
    * determinism (no extra distinct-values job at scale).
    */
  val pivotStatus = Query(
    "a9_pivot_status",
    """SELECT l_returnflag,
      |       COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F,
      |       COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, d) =>
    import spark.implicits._
    lineitem(spark, d)
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .count()
      .na.fill(0L, Seq("F", "O"))
      .orderBy($"l_returnflag")
  }

  /** V1/V2 — read-side dedup by rank: newest row per key wins (reference
    * `monthly_report.py:52-71`). One shuffle on the dedup key; the window
    * sort is per-partition. Explicit tiebreaker keeps it deterministic.
    */
  val dedupLatestEvent = Query(
    "v1_dedup_latest_event",
    """SELECT user_id, event_type, event_id, value
      |FROM (
      |  SELECT user_id, event_type, event_id, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                            ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (spark, d) =>
    import spark.implicits._
    // max_by on the (ts, event_id) ordering struct — a total order, so
    // the winner matches the ROW_NUMBER oracle while the plan is a
    // map-side-combinable hash aggregate instead of a full sort
    // (the dedupLatestAgg argument; see PLANS.md round-2 rewrites).
    events(spark, d)
      .groupBy($"user_id", $"event_type")
      .agg(max_by(
        struct($"event_id", $"value"),
        struct(unix_micros($"ts"), $"event_id")).as("__w"))
      .select($"user_id", $"event_type", $"__w.event_id", $"__w.value")
      .orderBy($"user_id", $"event_type")
  }

  /** V3/A7 — percent-of-group via unbounded partition window (reference
    * `data_preparation.py:262-267`): share of each linestatus within its
    * returnflag. Integer counts → the ratio is deterministic.
    */
  val pctOfGroup = Query(
    "v3_pct_of_group",
    """SELECT l_returnflag, l_linestatus, cnt,
      |       cnt / SUM(cnt) OVER (PARTITION BY l_returnflag) * 100 AS pct
      |FROM (
      |  SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY l_returnflag, l_linestatus
      |)
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, d) =>
    import spark.implicits._
    lineitem(spark, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("cnt"))
      .withColumn(
        "pct",
        $"cnt" / sum($"cnt").over(Window.partitionBy($"l_returnflag")) * 100)
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** C2/C3 — first-match-wins CASE WHEN bucketing (reference
    * `transform.py:125-157`, `data_preparation.py:53-60`).
    */
  val priorityBucket = Query(
    "c2_priority_bucket",
    """SELECT CASE WHEN o_orderpriority LIKE '1%' THEN 'urgent'
      |            WHEN o_orderpriority LIKE '2%' THEN 'high'
      |            WHEN lower(o_orderpriority) LIKE '%medium%' THEN 'normal'
      |            ELSE 'low' END AS priority_class,
      |       COUNT(*) AS n,
      |       COUNT(DISTINCT o_custkey) AS n_customers
      |FROM orders
      |GROUP BY 1
      |ORDER BY priority_class""".stripMargin) { (spark, d) =>
    import spark.implicits._
    orders(spark, d)
      .withColumn(
        "priority_class",
        when($"o_orderpriority".startsWith("1"), "urgent")
          .when($"o_orderpriority".startsWith("2"), "high")
          .when(lower($"o_orderpriority").contains("medium"), "normal")
          .otherwise("low"))
      .groupBy($"priority_class")
      .agg(count(lit(1)).as("n"), countDistinct($"o_custkey").as("n_customers"))
      .orderBy($"priority_class")
  }

  /** W2/W4 — case-insensitive regex filter (reference
    * `data_preparation.py:210`, `:281-282`), pushed ahead of the agg.
    */
  val regexFilter = Query(
    "w2_regex_filter",
    """SELECT p_brand, COUNT(*) AS n_parts,
      |       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS retail_value
      |FROM part
      |WHERE regexp_matches(p_type, '(?i)promo|econ')
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (spark, d) =>
    import spark.implicits._
    part(spark, d)
      .filter($"p_type".rlike("(?i)promo|econ"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"), sumMoney($"p_retailprice").as("retail_value"))
      .orderBy($"p_brand")
  }

  /** A8/O4 — zero-filled aggregation over a fixed 7-day domain (reference
    * `data_preparation.py:49-50`): Spark drops empty groups, so the
    * literal domain is left-joined back in — the domain side is a 7-row
    * local relation, broadcast for free.
    */
  val dowDomainFill = Query(
    "a8_dow_domain_fill",
    """WITH dows(day_of_week, dow) AS (VALUES
      |  ('Monday',1),('Tuesday',2),('Wednesday',3),('Thursday',4),
      |  ('Friday',5),('Saturday',6),('Sunday',7)),
      |agg AS (
      |  SELECT dayname(o_orderdate) AS day_of_week,
      |         COUNT(DISTINCT o_orderkey) AS n_orders
      |  FROM orders WHERE o_orderstatus = 'P' GROUP BY 1)
      |SELECT d.day_of_week, d.dow, COALESCE(a.n_orders, 0) AS n_orders
      |FROM dows d LEFT JOIN agg a ON d.day_of_week = a.day_of_week
      |ORDER BY d.dow""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val dows = Seq(
      ("Monday", 1), ("Tuesday", 2), ("Wednesday", 3), ("Thursday", 4),
      ("Friday", 5), ("Saturday", 6), ("Sunday", 7)
    ).toDF("day_of_week", "dow")
    val agg = orders(spark, d)
      .filter($"o_orderstatus" === "P")
      .groupBy(dayName($"o_orderdate").as("day_of_week"))
      .agg(countDistinct($"o_orderkey").as("n_orders"))
    dows.join(agg, Seq("day_of_week"), "left")
      .na.fill(0L, Seq("n_orders"))
      .select($"day_of_week", $"dow", $"n_orders")
      .orderBy($"dow")
  }

  /** A10 — histogram binning into hourly time slots (reference
    * `transform.py:171-197`): label is a pure column derivation, so this
    * is a plain single-shuffle aggregate.
    */
  val timeSlots = Query(
    "a10_time_slots",
    """SELECT printf('%02d:00-%02d:00', hour(ts), hour(ts) + 1) AS time_slot,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1
      |ORDER BY time_slot""".stripMargin) { (spark, d) =>
    import spark.implicits._
    events(spark, d)
      .groupBy(timeSlot($"ts").as("time_slot"))
      .agg(count(lit(1)).as("n_events"), sumMoney($"value").as("total_value"))
      .orderBy($"time_slot")
  }

  /** Join chain fact⋈fact⋈dims — revenue per region (TPC-H Q5 shape).
    * The two facts shuffle on their join keys once; nation/region/customer
    * are broadcast (at 100 TB customer would be bucket-joined instead —
    * the broadcast threshold decides, here it is explicit).
    */
  val regionRevenue = Query(
    "j1_region_revenue",
    """SELECT r_name,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |       COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin) { (spark, d) =>
    import spark.implicits._
    // Partial aggregation pushed BELOW the fact⋈fact join (Catalyst
    // does not push aggregates through joins): lineitem pre-reduces to
    // one decimal revenue row per orderkey with map-side combine, so
    // the big join carries |orders| two-column rows instead of
    // |lineitem| wide rows — and n_orders becomes a plain COUNT (the
    // countDistinct re-exchange disappears). Decimal sums are exact at
    // any nesting, so the single-level oracle SQL is unchanged.
    val revPerOrder = lineitem(spark, d)
      .groupBy($"l_orderkey")
      .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
        .cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("__rev"))
    revPerOrder
      .join(orders(spark, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(customer(spark, d)), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(spark, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region(spark, d)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        sum($"__rev").cast(org.apache.spark.sql.types.DoubleType).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"r_name")
  }

  /** O3/O5 — union + distinct (reference `load.py:196`,
    * `data_preparation.py:195`; distinct at `load.py:75`).
    */
  val unionDistinctUsers = Query(
    "o3_union_distinct_users",
    """SELECT DISTINCT user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id FROM events WHERE value > 150
      |)
      |ORDER BY user_id""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val ev = events(spark, d)
    ev.filter($"event_type" === "purchase").select($"user_id")
      .unionByName(ev.filter($"value" > 150).select($"user_id"))
      .distinct()
      .orderBy($"user_id")
  }

  /** F1/G2 — stringly-encoded modifier codec round-trip: build the
    * reference's `Name(Option);Name(Option)` encoding
    * (`transform.py:42-43`), then re-parse it with posexplode + regex
    * (`data_preparation.py:214`, `cumulative_report.py:255-282`).
    */
  val modifierParse = Query(
    "g1_modifier_parse",
    """SELECT p_partkey,
      |       generate_subscripts(string_split(modifiers, ';'), 1) - 1 AS idx,
      |       regexp_extract(unnest(string_split(modifiers, ';')), '^(.*?)\(', 1) AS mod_name,
      |       regexp_extract(unnest(string_split(modifiers, ';')), '\((.*?)\)', 1) AS mod_option
      |FROM (
      |  SELECT p_partkey, 'Brand(' || p_brand || ');Type(' || p_type || ')' AS modifiers
      |  FROM part
      |)
      |ORDER BY p_partkey, idx""".stripMargin) { (spark, d) =>
    import spark.implicits._
    part(spark, d)
      .withColumn(
        "modifiers",
        concat(lit("Brand("), $"p_brand", lit(");Type("), $"p_type", lit(")")))
      .select($"p_partkey", posexplode(split($"modifiers", ";")).as(Seq("idx", "m")))
      .select(
        $"p_partkey",
        $"idx".cast("long").as("idx"),
        regexp_extract($"m", "^(.*?)\\(", 1).as("mod_name"),
        regexp_extract($"m", "\\((.*?)\\)", 1).as("mod_option"))
      .orderBy($"p_partkey", $"idx")
  }

  /** §2.10 JSON — parse the events `props` JSON column; regexp-based
    * extraction so both engines share exact semantics (DuckDB's JSON
    * extension availability is not assumed).
    */
  val jsonProps = Query(
    "s7_json_props",
    """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 10 AS k_bucket,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1
      |ORDER BY k_bucket""".stripMargin) { (spark, d) =>
    import spark.implicits._
    events(spark, d)
      .withColumn("k_bucket",
        regexp_extract($"props", "\"k\": (\\d+)", 1).cast("long") % 10)
      .groupBy($"k_bucket")
      .agg(count(lit(1)).as("n"), sumMoney($"value").as("total_value"))
      .orderBy($"k_bucket")
  }

  /** Skew-mitigation salted join: same result as the plain join (the
    * oracle is the UNsalted SQL — proving the salt is semantics-free).
    */
  val saltedJoin = Query(
    "x1_salted_join",
    """SELECT o_orderpriority,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1
      |ORDER BY o_orderpriority""".stripMargin) { (spark, d) =>
    import spark.implicits._
    graft.operators.SkewJoin
      .saltedJoin(
        lineitem(spark, d), orders(spark, d).withColumnRenamed("o_orderkey", "l_orderkey"),
        key = "l_orderkey",
        saltSource = Seq("l_partkey", "l_suppkey", "l_linenumber"),
        saltBuckets = 8)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sumMoney($"l_extendedprice").as("total"))
      .orderBy($"o_orderpriority")
  }

  /** S7/S8 — the engine's SQL-text surface: the reference's Athena
    * window-dedup query run verbatim through spark.sql over registered
    * temp views (same SQL text serves as its own oracle).
    */
  val sqlSurface = Query(
    "s8_sql_dedup_surface",
    """SELECT user_id, COUNT(*) AS n_types,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM (
      |  SELECT user_id, event_type, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                            ORDER BY ts DESC, event_id DESC) AS rank_num
      |  FROM events
      |)
      |WHERE rank_num = 1
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (spark, d) =>
    events(spark, d).createOrReplaceTempView("events")
    spark.sql(
      """SELECT user_id, COUNT(*) AS n_types,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (
        |  SELECT user_id, event_type, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts DESC, event_id DESC) AS rank_num
        |  FROM events
        |)
        |WHERE rank_num = 1
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin)
  }

  /** §2.12 — event-time tumbling window aggregation (the batch form of
    * the streaming windowed revenue; same `window()` semantics Structured
    * Streaming uses, so the oracle pins the window alignment too).
    */
  val windowedRevenue = Query(
    "st1_windowed_revenue",
    """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M') AS window_start,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM events
      |GROUP BY 1
      |ORDER BY window_start""".stripMargin) { (spark, d) =>
    import spark.implicits._
    events(spark, d)
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n_events"), sumMoney($"value").as("revenue"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm").as("window_start"),
        $"n_events", $"revenue")
      .orderBy($"window_start")
  }

  /** a15's documented scale path made real: decile bucketing WITHOUT a
    * global sort. Exact continuous percentiles (one aggregate pass)
    * give the 9 boundaries; each row's bucket is then a broadcast
    * comparison — fully parallel, no single-partition window. Bucket
    * semantics are boundary-based (ties at a boundary bucket low), so
    * counts are approximately-equal rather than NTILE's exactly-equal —
    * the standard trade, pinned by its own oracle: DuckDB's
    * quantile_cont uses the same (n−1)·p interpolation as Spark's
    * percentile, so the boundaries — and therefore every bucket
    * assignment — hash-match.
    */
  val decileBoundaries = Query(
    "a15b_decile_scaled",
    """WITH b AS (
      |  SELECT quantile_cont(o_totalprice, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
      |  FROM orders
      |)
      |SELECT 1 + len(list_filter(qs, q -> o_totalprice > q)) AS decile,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders, b
      |GROUP BY 1
      |ORDER BY decile""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val o = orders(spark, d)
    val bounds = o.agg(
      expr("percentile(o_totalprice, array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))")
        .as("qs"))
    o.crossJoin(broadcast(bounds))
      .select(
        $"o_totalprice",
        (lit(1) + aggregate($"qs", lit(0),
          (acc, q) => acc + when($"o_totalprice" > q, 1).otherwise(0))).cast("long").as("decile"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n"), sumMoney($"o_totalprice").as("total"))
      .orderBy($"decile")
  }

  /** NTILE decile bucketing — quantile bins as a window over a total
    * order (deterministic: the ORDER BY includes the unique key).
    * Summarized per decile so the gate output is compact.
    */
  val ntileDeciles = Query(
    "a15_ntile_deciles",
    """SELECT decile, COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM (
      |  SELECT o_totalprice,
      |         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders
      |)
      |GROUP BY decile
      |ORDER BY decile""".stripMargin) { (spark, d) =>
    import spark.implicits._
    // A global NTILE is single-partition by construction; it is applied
    // here to a table whose per-row payload is two columns, and at
    // cluster scale the same decile cut would come from approx
    // percentile boundaries + a broadcast range join instead.
    val w = Window.orderBy($"o_totalprice", $"o_orderkey")
    orders(spark, d)
      .select($"o_totalprice", ntile(10).over(w).cast("long").as("decile"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n"), sumMoney($"o_totalprice").as("total"))
      .orderBy($"decile")
  }

  /** ROLLUP hierarchical aggregation: (status, priority) → status →
    * grand total in one pass — Spark and DuckDB share the grouping-set
    * semantics. Subtotal rows are labeled via GROUPING(col), not
    * COALESCE: a data NULL and a rollup NULL stay distinguishable, so
    * this template is safe on nullable group keys (COALESCE would
    * collide them into duplicate '<all>' keys with engine-dependent
    * order).
    */
  val rollupRevenue = Query(
    "a16_rollup_revenue",
    """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN '<all>'
      |            ELSE o_orderstatus END AS status,
      |       CASE WHEN GROUPING(o_orderpriority) = 1 THEN '<all>'
      |            ELSE o_orderpriority END AS priority,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (spark, d) =>
    import spark.implicits._
    orders(spark, d)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(
        count(lit(1)).as("n"), sumMoney($"o_totalprice").as("total"),
        grouping($"o_orderstatus").as("g_status"),
        grouping($"o_orderpriority").as("g_priority"))
      .select(
        when($"g_status" === 1, "<all>").otherwise($"o_orderstatus").as("status"),
        when($"g_priority" === 1, "<all>").otherwise($"o_orderpriority").as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  /** Native one-pass top-k aggregate vs the two-shuffle groupBy+window
    * idiom: `top_k_count(p_brand, 5)` per linestatus. The oracle IS the
    * two-shuffle form (count + ROW_NUMBER), proving the single
    * `ObjectHashAggregate` pass — partial hash-count maps combined
    * map-side — returns the identical ranking under the same
    * (count desc, value asc) total order.
    */
  val topKNative = Query(
    "a17_topk_native",
    """WITH counts AS (
      |  SELECT l_linestatus, p_brand, COUNT(*) AS cnt
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2
      |),
      |ranked AS (
      |  SELECT l_linestatus, p_brand AS brand, cnt,
      |         ROW_NUMBER() OVER (PARTITION BY l_linestatus
      |                            ORDER BY cnt DESC, p_brand) AS rank
      |  FROM counts
      |)
      |SELECT l_linestatus, CAST(rank AS BIGINT) AS rank, brand, cnt
      |FROM ranked
      |WHERE rank <= 5
      |ORDER BY l_linestatus, rank""".stripMargin) { (spark, d) =>
    import spark.implicits._
    lineitem(spark, d)
      .join(broadcast(part(spark, d)), $"l_partkey" === $"p_partkey")
      .groupBy($"l_linestatus")
      .agg(graft.functions.TopKCount.column(spark, $"p_brand", 5).as("top"))
      .select($"l_linestatus", posexplode($"top").as(Seq("pos", "s")))
      .select(
        $"l_linestatus",
        ($"pos" + 1).cast("long").as("rank"),
        $"s.value".as("brand"),
        $"s.cnt".as("cnt"))
      .orderBy($"l_linestatus", $"rank")
  }

  /** l1 — Z-order (Morton) layout key: interleave the bits of the two
    * range-queried dimensions so one sort order co-locates rows close in
    * BOTH — the lakehouse OPTIMIZE ZORDER primitive. The gate pins the
    * interleave expression bit-for-bit (the oracle SQL is GENERATED from
    * the same bit table — [[graft.functions.ZOrder]]); ZOrderSpec
    * demonstrates the layout payoff (2-D box predicates prune z-band
    * partitions a single-column sort cannot).
    */
  val zorderKey = Query(
    "l1_zorder_key", {
      val z = graft.functions.ZOrder
        .zValueSqlDuck("(l_partkey % 1024)", "(l_suppkey % 1024)", 10)
      s"""SELECT CAST(($z >> 12) AS BIGINT) AS z_band,
         |       COUNT(*) AS n,
         |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM lineitem
         |GROUP BY 1
         |ORDER BY z_band""".stripMargin
    }) { (spark, d) =>
    import spark.implicits._
    val z = graft.functions.ZOrder.zValue($"l_partkey" % 1024, $"l_suppkey" % 1024, 10)
    lineitem(spark, d)
      .withColumn("z_band", shiftright(z, 12).cast("long"))
      .groupBy($"z_band")
      .agg(count(lit(1)).as("n"), sumMoney($"l_extendedprice").as("total"))
      .orderBy($"z_band")
  }

  /** l2 — bucketed co-located join: both sides pre-hashed into aligned
    * buckets on the join key at WRITE time (one file per bucket, sorted),
    * so the join itself runs with no Exchange and no Sort — the pay-the-
    * shuffle-once layout for repeated fact⋈dim joins. Broadcast is
    * disabled in a child session so the bucketed SortMergeJoin is what
    * actually executes (BucketingSpec asserts the exchange-free plan);
    * the oracle is the plain join — bucketing must be semantics-free.
    */
  val bucketedJoin = Query(
    "l2_bucketed_join",
    """SELECT c_mktsegment, COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1
      |ORDER BY c_mktsegment""".stripMargin) { (spark, d) =>
    import graft.operators.Bucketing
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", -1L)
    val suf = Bucketing.suffix(s2, d)
    val ot = Bucketing.ensureBucketed(s2, s"orders_bk_$suf", orders(s2, d), "o_custkey", 16)
    val ct = Bucketing.ensureBucketed(s2, s"customer_bk_$suf", customer(s2, d), "c_custkey", 16)
    import s2.implicits._
    s2.table(ot).join(s2.table(ct), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sumMoney($"o_totalprice").as("total"))
      .orderBy($"c_mktsegment")
  }

  /** x2 — bloom-filter semi-join reduction: Catalyst's InjectRuntimeFilter
    * builds a bloom filter from the selective dim side and pushes a
    * `might_contain` probe below the fact side's shuffle, so non-matching
    * fact rows drop BEFORE the exchange — at 100 TB that is the
    * difference between shuffling the whole fact table and shuffling the
    * ~20% that survives the semi-join. Enabled via a child session
    * (thresholds sized for local data; on a cluster the defaults fire);
    * the filter is a pure reduction — false positives are re-checked by
    * the join — so the oracle is the plain join SQL.
    */
  val bloomSemiJoin = Query(
    "x2_bloom_semijoin",
    """SELECT l_linestatus, COUNT(*) AS n,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1
      |ORDER BY l_linestatus""".stripMargin) { (spark, d) =>
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", -1L)
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", true)
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", 0L)
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    import s2.implicits._
    lineitem(s2, d)
      .join(
        orders(s2, d).filter($"o_orderpriority" === "1-URGENT"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(count(lit(1)).as("n"), sumMoney($"l_extendedprice").as("total"))
      .orderBy($"l_linestatus")
  }

  val all: Seq[Query] = Seq(
    topParts, segmentOrders, pricingSummary, globalKpis, avgMonthlyRevenue,
    pivotStatus, dedupLatestEvent, pctOfGroup, priorityBucket, regexFilter,
    dowDomainFill, timeSlots, regionRevenue, unionDistinctUsers, modifierParse,
    jsonProps, saltedJoin, sqlSurface, windowedRevenue, ntileDeciles,
    decileBoundaries, rollupRevenue, topKNative, zorderKey, bucketedJoin,
    bloomSemiJoin)
}
