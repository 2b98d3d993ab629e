package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{AsOfJoin, RangeJoin, Sampling, Sessionize}

/** Gate battery for the temporal-relational operators (sessionization,
  * as-of join, keyed/bucketed range joins) and deterministic sampling.
  *
  * All time arithmetic runs on integer epoch-microseconds: events.ts is
  * parquet TIMESTAMP(NANOS), which Spark floors to micros on read — the
  * oracles apply the same floor (`epoch_ns(ts) // 1000`) so both engines
  * compare identical integers. Sub-second timestamp comparisons through
  * engine-native interval types would NOT be portable.
  */
object RelQueries {

  private val HourMicros = 3600L * 1000000L
  private val GapMicros = 30L * 60L * 1000000L // 30-min session gap
  private val BurstMicros = 300L * 1000000L // 5-min error-burst window

  /** Epoch-micros CTE shared by the oracles. */
  private val eventsUs =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, value,
      |         epoch_ns(ts) // 1000 AS tus
      |  FROM events
      |)""".stripMargin

  /** r1 — gap-based sessionization (batch replay of streaming session
    * windows): 30-min inactivity gap per user, per-session stats.
    */
  val sessionStats = Query(
    "r1_session_stats",
    s"""$eventsUs,
       |l AS (
       |  SELECT user_id, event_id, value, tus,
       |         lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev_t
       |  FROM e
       |),
       |s AS (
       |  SELECT user_id, event_id, value, tus,
       |         CAST(SUM(CASE WHEN prev_t IS NULL OR tus - prev_t > $GapMicros
       |                       THEN 1 ELSE 0 END)
       |              OVER (PARTITION BY user_id ORDER BY tus, event_id
       |                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
       |  FROM l
       |)
       |SELECT user_id, session_no,
       |       MIN(tus) AS session_start,
       |       MAX(tus) AS session_end,
       |       COUNT(*) AS n_events,
       |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       |FROM s
       |GROUP BY user_id, session_no
       |ORDER BY user_id, session_no""".stripMargin) { (spark, d) =>
    val e = events(spark, d).withColumn("tus", unix_micros(col("ts")))
    Sessionize
      .sessionStats(e, "user_id", "tus", "event_id", GapMicros, "value")
      .orderBy(col("user_id"), col("session_no"))
  }

  /** r2 — backward as-of join (union-and-fill, one shuffle, no range
    * cross product): each purchase picks up the user's latest view at or
    * before it.
    */
  val asOfViewBeforePurchase = Query(
    "r2_asof_view_before_purchase",
    s"""$eventsUs,
       |p AS (SELECT * FROM e WHERE event_type = 'purchase'),
       |v AS (SELECT * FROM e WHERE event_type = 'view')
       |SELECT p.event_id, p.user_id,
       |       (SELECT v.event_id FROM v
       |        WHERE v.user_id = p.user_id AND v.tus <= p.tus
       |        ORDER BY v.tus DESC, v.event_id DESC LIMIT 1) AS view_event_id,
       |       (SELECT v.value FROM v
       |        WHERE v.user_id = p.user_id AND v.tus <= p.tus
       |        ORDER BY v.tus DESC, v.event_id DESC LIMIT 1) AS view_value
       |FROM p
       |ORDER BY p.event_id""".stripMargin) { (spark, d) =>
    val e = events(spark, d).withColumn("tus", unix_micros(col("ts")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "tus")
    val views = e.filter(col("event_type") === "view")
      .select(
        col("user_id"), col("tus"),
        col("event_id").as("view_event_id"), col("value").as("view_value"))
    AsOfJoin
      .asOfBackward(
        purchases, views, "user_id", "tus", "tus",
        payload = Seq("view_event_id", "view_value"),
        rightTiebreaker = "view_event_id")
      .select("event_id", "user_id", "view_event_id", "view_value")
      .orderBy(col("event_id"))
  }

  /** r3 — keyed window join: purchases by the same user within one hour
    * after each click (left join so zero-conversion clicks survive).
    */
  val clickToPurchase = Query(
    "r3_click_purchase_window",
    s"""$eventsUs,
       |c AS (SELECT * FROM e WHERE event_type = 'click'),
       |p AS (SELECT * FROM e WHERE event_type = 'purchase')
       |SELECT c.event_id, COUNT(p.event_id) AS n_purchases
       |FROM c LEFT JOIN p
       |  ON p.user_id = c.user_id
       | AND p.tus >= c.tus AND p.tus <= c.tus + $HourMicros
       |GROUP BY c.event_id
       |ORDER BY c.event_id""".stripMargin) { (spark, d) =>
    val e = events(spark, d).withColumn("tus", unix_micros(col("ts")))
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "tus")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user_id"), col("tus").as("p_tus"),
        col("event_id").as("p_event_id"))
    RangeJoin
      .keyedWindowJoin(
        clicks, purchases, "user_id", "p_user_id", "tus", "p_tus",
        HourMicros, "left_outer")
      .groupBy(col("event_id"))
      .agg(count(col("p_event_id")).as("n_purchases"))
      .orderBy(col("event_id"))
  }

  /** r4 — key-less bucketed range join: error-burst pairs, a following
    * error within 5 minutes anywhere in the system. The time-bucket equi
    * key keeps the plan a hash join — Spark's native plan for a pure
    * range predicate is a quadratic nested loop.
    */
  val errorBurstPairs = Query(
    "r4_error_burst_pairs",
    s"""$eventsUs,
       |err AS (SELECT event_id, tus FROM e WHERE event_type = 'error')
       |SELECT a.event_id AS a_id, b.event_id AS b_id
       |FROM err a JOIN err b
       |  ON b.tus >= a.tus AND b.tus <= a.tus + $BurstMicros
       | AND a.event_id <> b.event_id
       |ORDER BY a_id, b_id""".stripMargin) { (spark, d) =>
    val err = events(spark, d)
      .filter(col("event_type") === "error")
      .withColumn("tus", unix_micros(col("ts")))
    val a = err.select(col("event_id").as("a_id"), col("tus").as("a_tus"))
    val b = err.select(col("event_id").as("b_id"), col("tus").as("b_tus"))
    RangeJoin
      .bucketedWindowJoin(a, b, "a_tus", "b_tus", BurstMicros)
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id")
      .orderBy(col("a_id"), col("b_id"))
  }

  /** r5 — deterministic stratified sample: per-language keep rates as a
    * pure function of doc_id (md5 bucket), reproducible across engines,
    * replays, and incremental loads.
    */
  val stratifiedSample = Query(
    "r5_stratified_sample",
    """SELECT doc_id, lang
      |FROM documents
      |WHERE CAST(concat('0x', substr(md5(concat('strat1:', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 100
      |      < CASE WHEN lang = 'en' THEN 10 WHEN lang = 'zh' THEN 50 ELSE 25 END
      |ORDER BY doc_id""".stripMargin) { (spark, d) =>
    Sampling
      .stratified(
        documents(spark, d), "doc_id", "lang", "strat1",
        Map("en" -> 10, "zh" -> 50), defaultPct = 25)
      .select("doc_id", "lang")
      .orderBy(col("doc_id"))
  }

  /** r6 — sketch aggregates: HLL++ distinct counts and quantile
    * sketches per event type. Sketches are THE 100 TB cardinality tool
    * (constant memory, map-side combinable, mergeable across
    * partitions) but their estimates are implementation-defined, so no
    * SQL engine can reproduce the estimate bit-for-bit. The gate
    * instead emits the EXACT values (oracled normally) plus
    * bound-check flags computed in Spark against those exact values;
    * the oracle asserts the flags are 1. A sketch drifting past its
    * error bound flips a flag and fails the hash — the bound assertion
    * lives in the driver gate, not just `RelOpsSpec`.
    */
  val sketchProfile = Query(
    "r6_sketch_profile",
    """SELECT event_type,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_events,
      |       CAST(1 AS BIGINT) AS users_within_5pct,
      |       CAST(1 AS BIGINT) AS events_within_5pct,
      |       CAST(1 AS BIGINT) AS median_within_bounds
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, d) =>
    events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        countDistinct(col("event_id")).as("exact_events"),
        approx_count_distinct(col("event_id"), 0.01).as("approx_events"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("median_est"),
        expr("percentile(value, 0.45)").as("p45"),
        expr("percentile(value, 0.55)").as("p55"))
      .select(
        col("event_type"), col("exact_users"), col("exact_events"),
        when(abs(col("approx_users") - col("exact_users"))
          <= col("exact_users") * 0.05, 1L).otherwise(0L).as("users_within_5pct"),
        when(abs(col("approx_events") - col("exact_events"))
          <= col("exact_events") * 0.05, 1L).otherwise(0L).as("events_within_5pct"),
        when(col("median_est").between(col("p45"), col("p55")), 1L)
          .otherwise(0L).as("median_within_bounds"))
      .orderBy(col("event_type"))
  }

  /** r7 — heavy hitters: Spark's `stat.freqItems` (Karp et al.
    * streaming majority sketch — single pass, constant memory, the
    * 100 TB tool for hot-key discovery before salting). The sketch
    * admits false positives but NEVER false negatives for items with
    * freq > support·n, so the gate emits the EXACT heavy hitters
    * (oracled) plus an in-sketch flag the oracle asserts is 1 — same
    * bound-check pattern as r6.
    */
  val heavyHitters = Query(
    "r7_heavy_hitters",
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(1 AS BIGINT) AS in_sketch
      |FROM events
      |GROUP BY user_id
      |HAVING COUNT(*) > 0.007 * (SELECT COUNT(*) FROM events)
      |ORDER BY user_id""".stripMargin) { (spark, d) =>
    val ev = events(spark, d)
    val total = ev.count()
    val sketch = ev.stat.freqItems(Array("user_id"), 0.007)
    ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(0.007) * lit(total.toDouble))
      .crossJoin(broadcast(sketch))
      .select(
        col("user_id"), col("cnt"),
        when(array_contains(col("user_id_freqItems"), col("user_id")), 1L)
          .otherwise(0L).as("in_sketch"))
      .orderBy(col("user_id"))
  }

  /** cdc1 — SCD2 history via a genuine INCREMENTAL merge: the log is
    * split at its midpoint instant, the base half builds a history, and
    * [[graft.operators.Scd2.applyChanges]] folds the delta half in —
    * closing open versions and stacking continued version numbers. The
    * oracle recomputes the WHOLE history from the full log in one
    * window pass, so the hash proves merge-then-append ≡ full-recompute
    * (the exact correctness contract of a warehouse MERGE load); the
    * cutoff never appears in the oracle.
    */
  val scd2Merge = Query(
    "cdc1_scd2_merge",
    s"""$eventsUs
       |SELECT user_id, value,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS BIGINT) AS version,
       |       tus AS valid_from,
       |       lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS valid_to
       |FROM e
       |ORDER BY user_id, version""".stripMargin) { (spark, d) =>
    import graft.operators.Scd2
    val e = events(spark, d).select(
      col("event_id"), col("user_id"), col("value"),
      unix_micros(col("ts")).as("tus"))
    // Deterministic time split: (min+max) div 2 of the log's instants,
    // attached via a broadcast scalar so the plan stays action-free.
    val cut = e.agg(expr("(min(tus) + max(tus)) div 2").as("__cut"))
    val ec = e.crossJoin(broadcast(cut))
    val base = ec.filter(col("tus") <= col("__cut")).drop("__cut")
    val delta = ec.filter(col("tus") > col("__cut")).drop("__cut")
    Scd2
      .applyChanges(
        Scd2.fromLog(base, "user_id", "tus", "event_id", Seq("value")),
        delta, "user_id", "tus", "event_id", Seq("value"))
      .select("user_id", "value", "version", "valid_from", "valid_to")
      .orderBy(col("user_id"), col("version"))
  }

  /** cdc2 — the GENERAL SCD2 merge, no ordering precondition: the log is
    * split by event_id PARITY, so the delta interleaves with recorded
    * history in time (the exact case [[graft.operators.Scd2.applyChanges]]
    * rejects with a named error) and
    * [[graft.operators.Scd2.applyChangesAnyOrder]] folds it in — keys
    * untouched by the delta pass through unmodified, touched keys are
    * rebuilt from their interleaved history + delta rows. The oracle
    * replays the documented tie contract in one window pass over the
    * FULL log: within a key, order is (time, history-before-delta,
    * tiebreaker) — i.e. ORDER BY tus, event_id % 2, event_id, since the
    * even half is the base. When no history/delta rows share a
    * timestamp this is exactly fromLog(base ∪ delta); the hash proves
    * rebuild-touched ∪ passthrough-untouched ≡ full-recompute, the
    * correctness contract of an out-of-order warehouse MERGE.
    */
  val scd2OutOfOrder = Query(
    "cdc2_scd2_out_of_order",
    s"""$eventsUs
       |SELECT user_id, value,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
       |         ORDER BY tus, event_id % 2, event_id) AS BIGINT) AS version,
       |       tus AS valid_from,
       |       lead(tus) OVER (PARTITION BY user_id
       |         ORDER BY tus, event_id % 2, event_id) AS valid_to
       |FROM e
       |ORDER BY user_id, version""".stripMargin) { (spark, d) =>
    import graft.operators.Scd2
    val e = events(spark, d).select(
      col("event_id"), col("user_id"), col("value"),
      unix_micros(col("ts")).as("tus"))
    val base = e.filter(col("event_id") % 2 === 0)
    val delta = e.filter(col("event_id") % 2 =!= 0)
    Scd2
      .applyChangesAnyOrder(
        Scd2.fromLog(base, "user_id", "tus", "event_id", Seq("value")),
        delta, "user_id", "tus", "event_id", Seq("value"))
      .select("user_id", "value", "version", "valid_from", "valid_to")
      .orderBy(col("user_id"), col("version"))
  }

  /** r8 — WEIGHTED sample without replacement (Efraimidis–Spirakis
    * A-ES): 100 documents drawn proportional to token count, the
    * corpus-subsampling primitive (training mixes sample docs by
    * token mass, not uniformly). One parallel pass: priority =
    * micro-nat-rounded ln(u)/w with u hash-derived from the doc id,
    * global top-100 by TakeOrdered — never a full sort, never an RNG.
    * The only cross-engine float ops are the house ln→micro rounding
    * and one integer÷integer IEEE division (correctly rounded, hence
    * bit-identical), so the SAMPLE SET ITSELF is hash-pinned.
    */
  val weightedSample = Query(
    "r8_weighted_sample",
    """WITH w AS (
      |  SELECT doc_id,
      |         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
      |         CAST(round(ln((CAST(concat('0x', substr(md5(concat('ws1:', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) + 1)
      |                       / 268435456.0) * 1000000) AS BIGINT) AS lnu
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n_tokens FROM w
      |  ORDER BY CAST(lnu AS DOUBLE) / CAST(n_tokens AS DOUBLE) DESC, doc_id
      |  LIMIT 100)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
      |FROM s ORDER BY doc_id""".stripMargin) { (spark, d) =>
    import spark.implicits._
    Sampling
      .weightedSample(
        documents(spark, d)
          .select($"doc_id", graft.functions.Exprs.tokenCount($"text").as("n_tokens")),
        "doc_id", "n_tokens", "ws1", n = 100)
      .orderBy($"doc_id")
  }

  val all: Seq[Query] = Seq(
    sessionStats, asOfViewBeforePurchase, clickToPurchase, errorBurstPairs,
    stratifiedSample, sketchProfile, heavyHitters, scd2Merge, scd2OutOfOrder,
    weightedSample)
}
