package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are fully materialized via count() after
  * a warm-up action that JIT-compiles the read path.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The default codegen class cache holds 100 entries; a full
      // 100-gate battery cycles far more generated classes than that,
      // so with the default every timed run recompiles every stage —
      // the multi-stage gates (PQ training: ~dozens of codegen units)
      // degrade 10-100x ONLY in-battery while isolated runs stay fast.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: touch every table once so scheduler/codegen init and file
    // listing are not billed to the first query.
    Seq(
      Tables.lineitem _, Tables.orders _, Tables.customer _, Tables.part _,
      Tables.nation _, Tables.region _, Tables.supplier _, Tables.events _,
      Tables.documents _, Tables.embeddings _)
      .foreach(load => load(spark, sfDir).count())
    // Steady-state measurement: one untimed warm-up execution per query
    // (codegen compilation + JIT), then the timed run. Each run fully
    // materializes via count(). SPARK_GRAFT_BENCH_WARMUP=0 skips the
    // warm-up pass for long large-SF runs where doubling the wall clock
    // costs more than first-run JIT noise.
    // Optional args: run only the named queries (dev loop; the driver
    // passes no args, so its behavior is unchanged).
    val only = args.toSet
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0")
      ordered.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    // Drop everything the warm-up pinned (FPGrowth fits leak persisted
    // freqItemsets RDDs; accumulated caches evict useful ones), then
    // re-warm the one cache the POS battery shares by design.
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    System.gc()
    val pos = graft.queries.PosQueries.posify(spark, sfDir)
    pos.cache()
    pos.count()
    // Median of N timed runs per query — taken across N FULL BATTERY
    // PASSES, not N consecutive runs. The shared bench host sees
    // multi-minute external contention windows (observed: one ~6 min
    // window inflated a contiguous alphabetical band of gates 20-90×
    // while the rest of the battery was clean — the same signature as
    // round 4's "phantom regressions"). Consecutive per-gate runs all
    // land inside such a window and the median keeps the noise; with
    // full passes the window inflates ONE pass and the cross-pass
    // median rejects it. Gates still run serially within a pass, so
    // per-gate attribution is unchanged.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    // Contention probe: a fixed single-thread integer loop, timed before
    // each pass. On a quiet host it is constant (~CPU-pinned); external
    // host load (invisible to guest load averages) inflates it in the
    // same proportion it inflates the gate times — the artifact carries
    // the probes so a reader can judge how trustworthy the window was.
    def probe(): Double = {
      val t0 = System.nanoTime()
      var i = 0L; var acc = 0L
      while (i < 2_000_000_000L) { acc += i & 1023; i += 1 }
      if (acc == 42) println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    val probes = collection.mutable.ArrayBuffer[Double]()
    val passes = (1 to iters).map { _ =>
      probes += probe()
      ordered.map { case (name, fn) => name -> timeOnce(fn) }.toMap
    }
    probes += probe()
    val results = ordered.map { case (name, _) =>
      val times = passes.map(_(name)).sorted(Ordering.Double.TotalOrdering)
      name -> times(times.length / 2)
    }
    // Per-gate MIN across passes: the contention-robust secondary
    // estimator (a gate's floor is its true cost; contention only adds).
    val mins = ordered.map { case (name, _) => name -> passes.map(_(name)).min }.toMap
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Full-precision, full-name artifact → file. The printed line is size-
    // constrained (see below), so the complete record lives here; committed
    // per-round as BENCH_sf01_r{N}.json / BENCH_sf1_r{N}.json.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullMins = results.map { case (k, _) => "\"" + k + "\":" + mins(k) }
      .mkString("{", ",", "}")
    val probesJson = probes.mkString("[", ",", "]")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"queries_min":$fullMins,"probes":$probesJson,"sf":"$sfDir","iters":$iters}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "bench_full.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (fullJson + "\n").getBytes("UTF-8"))
    // Printed line: the harness that collects this keeps only the LAST 2000
    // characters of stdout (plus sbt's trailing "[success] Total time" line),
    // so 86 full query names × full-precision doubles (~3 KB) gets truncated
    // and fails to parse. Compress to the gate-ID prefix (unique except the
    // two p16 gates, which keep their full names) and centisecond precision:
    // ~1.2 KB, well inside the window. Legend: short key = full name up to
    // the first '_'; bench_full.json has the uncompressed map.
    val prefix = results.map { case (k, _) => k -> k.takeWhile(_ != '_') }.toMap
    val collisions = prefix.values.groupBy(identity).collect {
      case (p, g) if g.size > 1 => p
    }.toSet
    // Locale-pinned formatting: f"" interpolators use the default JVM
    // locale, and a comma decimal separator (de_DE, tr_TR) would make
    // the printed line invalid JSON.
    def fmt2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) =>
      val key = if (collisions(prefix(k))) k else prefix(k)
      "\"" + key + "\":" + fmt2(v)
    }.mkString("{", ",", "}")
    val sfShort = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val line =
      s"""{"metric":"total","value":${fmt2(total)},"unit":"sec","queries":$qs,"sf":"$sfShort","iters":$iters}"""
    println(line)
    spark.stop()
  }
}
