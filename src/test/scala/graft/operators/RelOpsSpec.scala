package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit contracts for the temporal-relational operators: sessionization
  * gap/tie rules, as-of inclusivity and tie-breaking, range-join bucket
  * coverage, and sampling determinism/strata rates.
  */
class RelOpsSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000L // one minute in micros

  test("sessionize: gap strictly greater than threshold starts a new session") {
    // user 1: events at 0, 10, 40, 70 min with 30-min gap → the 10→40
    // and 40→70 gaps are exactly 30 min (NOT > gap) → one session.
    // user 2: 0 then 31 min → two sessions.
    val df = Seq(
      (1L, 0L * M, 10L), (1L, 10L * M, 11L), (1L, 40L * M, 12L), (1L, 70L * M, 13L),
      (2L, 0L * M, 20L), (2L, 31L * M, 21L)
    ).toDF("user_id", "tus", "event_id")
    val out = Sessionize.withSessionNo(df, "user_id", "tus", "event_id", 30L * M)
      .select("user_id", "event_id", "session_no").as[(Long, Long, Long)]
      .collect().sorted
    assert(out.toSeq == Seq(
      (1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 1L), (1L, 13L, 1L),
      (2L, 20L, 1L), (2L, 21L, 2L)))
  }

  test("asOfBackward: inclusive at equal time, latest-then-tiebreaker wins, null before any right row") {
    val left = Seq((1L, 100L, "a"), (1L, 50L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, 7L), // equal time → visible
      (1L, 100L, 9L), // same (k, t): larger tiebreaker wins
      (1L, 40L, 1L),
      (2L, 11L, 5L) // after left's t=10 → invisible
    ).toDF("k", "rt", "payload_id")
    val out = AsOfJoin
      .asOfBackward(left, right, "k", "t", "rt", Seq("payload_id"), "payload_id")
      .select("tag", "payload_id").as[(String, Option[Long])]
      .collect().toMap
    assert(out == Map("a" -> Some(9L), "b" -> Some(1L), "c" -> None))
  }

  test("bucketedWindowJoin finds pairs across bucket boundaries") {
    // window 10: (95, 104) spans two buckets; (0, 11) is outside.
    val a = Seq((1L, 95L), (2L, 0L)).toDF("a_id", "a_t")
    val b = Seq((10L, 104L), (11L, 11L), (12L, 95L)).toDF("b_id", "b_t")
    val out = RangeJoin.bucketedWindowJoin(a, b, "a_t", "b_t", 10L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (1L, 12L)))
  }

  test("property: sessionize agrees with an in-memory reference fold on random event sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genEvents = Gen.listOfN(120, for {
      u <- Gen.choose(1L, 5L)
      t <- Gen.choose(0L, 200L) // minutes; gap threshold 10 min
    } yield (u, t * M))
    (1 to 5).foreach { i =>
      val raw = genEvents.apply(Gen.Parameters.default, Seed(7L + i)).get
        .zipWithIndex.map { case ((u, t), id) => (u, t, id.toLong) }
      val out = Sessionize
        .withSessionNo(raw.toDF("user_id", "tus", "event_id"), "user_id", "tus", "event_id", 10L * M)
        .select("user_id", "event_id", "session_no").as[(Long, Long, Long)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      // Reference: per user, sort by (tus, event_id), fold gaps.
      val expected = raw.groupBy(_._1).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._2, e._3))
        var s = 0L; var prev = Long.MinValue
        sorted.map { case (_, t, id) =>
          if (prev == Long.MinValue || t - prev > 10L * M) s += 1
          prev = t
          (u, id) -> s
        }
      }.toMap
      assert(out == expected)
      // Every event lands in exactly one session.
      assert(out.size == raw.size)
    }
  }

  test("property: asOfBackward agrees with an in-memory reference on random data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genLeft = Gen.listOfN(60, for {
      k <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 100L)
    } yield (k, t))
    val genRight = Gen.listOfN(60, for {
      k <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 100L)
    } yield (k, t))
    (1 to 5).foreach { i =>
      val ls = genLeft.apply(Gen.Parameters.default, Seed(11L + i)).get
        .zipWithIndex.map { case ((k, t), id) => (k, t, id.toLong) }
      val rs = genRight.apply(Gen.Parameters.default, Seed(101L + i)).get
        .zipWithIndex.map { case ((k, t), id) => (k, t, 1000L + id) }
      val out = AsOfJoin
        .asOfBackward(
          ls.toDF("k", "t", "lid"),
          rs.toDF("k", "rt", "rid"),
          "k", "t", "rt", Seq("rid"), "rid")
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      val expected = ls.map { case (k, t, lid) =>
        val cand = rs.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (cand.isEmpty) None else Some(cand.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(out == expected)
    }
  }

  test("sketch aggregates stay within 5% of exact on the sf0.001 events table") {
    // The gate query now computes the bound checks itself (the oracle
    // asserts the flags are 1); the spec asserts the same flags plus
    // that the exact counts agree with an independent aggregation.
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.RelQueries.sketchProfile.build(spark, d)
      .select("event_type", "exact_users", "users_within_5pct",
        "events_within_5pct", "median_within_bounds")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, _, uOk, eOk, mOk) =>
      assert(uOk === 1L, s"$k users drifted past 5%")
      assert(eOk === 1L, s"$k events drifted past 5%")
      assert(mOk === 1L, s"$k median outside p45..p55")
    }
    val exactUsers = graft.Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (k, u, _, _, _) => assert(u === exactUsers(k)) }
  }

  test("stratified sampling is deterministic and respects per-stratum rates") {
    val docs = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("id", "lang")
    val s1 = Sampling.stratified(docs, "id", "lang", "s", Map("en" -> 10, "zh" -> 50), 25)
    val s2 = Sampling.stratified(docs, "id", "lang", "s", Map("en" -> 10, "zh" -> 50), 25)
    val ids1 = s1.select("id").as[Long].collect().toSet
    assert(ids1 == s2.select("id").as[Long].collect().toSet, "same salt → same sample")
    val byLang = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    // 1000 docs per stratum; md5 buckets are near-uniform.
    assert(byLang("en") > 50 && byLang("en") < 160)
    assert(byLang("zh") > 420 && byLang("zh") < 580)
    // different salt → different sample
    val ids3 = Sampling.stratified(docs, "id", "lang", "other", Map("en" -> 10, "zh" -> 50), 25)
      .select("id").as[Long].collect().toSet
    assert(ids1 != ids3)
  }

  // ---- weightedSample (Efraimidis–Spirakis A-ES) ---------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The operator's exact arithmetic in plain Scala. */
  private def aesRef(rows: Seq[(Long, Long)], salt: String, n: Int): Seq[Long] = {
    rows.map { case (id, w) =>
      val h = java.lang.Long.parseLong(md5hex(s"$salt:$id").take(7), 16)
      val lnu = math.round(math.log((h + 1).toDouble / 268435456d) * 1e6)
      (id, lnu.toDouble / w.toDouble)
    }.sortBy { case (id, p) => (-p, id) }.take(n).map(_._1)
  }

  test("weightedSample equals the local A-ES replay bit-for-bit") {
    val rows = (1L to 300L).map(i => (i, 1L + i % 17))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", "t", 40)
      .select("id").as[Long].collect().toSet
    assert(got == aesRef(rows, "t", 40).toSet)
  }

  test("weightedSample favours heavy weights (inclusion scales with w)") {
    // one row carries half the total mass; over many salts it must be
    // sampled (n=1) far more often than any individual light row
    val rows = (1L to 50L).map(i => (i, if (i == 7L) 49L else 1L))
    val picks = (0 until 40).map { s =>
      aesRef(rows, s"salt$s", 1).head
    }
    val heavy = picks.count(_ == 7L)
    assert(heavy >= 10, s"heavy row picked only $heavy/40 — weighting broken")
    // engine agrees with the replay on a few of those salts
    val df = rows.toDF("id", "w")
    Seq("salt0", "salt1", "salt2").foreach { s =>
      val got = Sampling.weightedSample(df, "id", "w", s, 1)
        .select("id").as[Long].head()
      assert(got == aesRef(rows, s, 1).head)
    }
  }

  test("weightedSample is deterministic under repartitioning and plans as TakeOrdered") {
    val rows = (1L to 500L).map(i => (i, 1L + i % 5))
    val df = rows.toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", "t", 25)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", "t", 25)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    val plan = Sampling.weightedSample(df, "id", "w", "t", 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted sample lost the top-n plan (full sort?):\n$plan")
  }

  test("weightedSample fails fast on zero and negative weights") {
    // w = 0 → -Infinity priority (silently never sampled); w < 0 flips
    // ln(u)/w positive (that row ALWAYS sampled). Both must be loud
    // errors, not silent sample corruption.
    Seq(0L, -3L).foreach { bad =>
      val df = ((1L to 10L).map(i => (i, 1L + i % 4)) :+ (99L, bad)).toDF("id", "w")
      val e = intercept[Exception] {
        Sampling.weightedSample(df, "id", "w", "t", 5).collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("non-positive weight")),
        s"expected the aesPriority guard for w=$bad, got: ${e.getMessage}")
    }
    // valid weights are untouched by the guard
    val ok = Sampling.weightedSample(
      (1L to 50L).map(i => (i, 1L + i % 4)).toDF("id", "w"), "id", "w", "t", 5)
    assert(ok.count() == 5L)
  }
}
