package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are fully materialized via count().
  *
  * Timeout-robust contract (the driver runs this under a hard timeout):
  *   - a wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default 420 s)
  *     gates each additional battery pass — a pass only starts if the
  *     projected finish fits the budget, so the process exits 0 instead
  *     of being killed mid-battery;
  *   - the compact JSON line is printed after EVERY completed pass (best
  *     estimate so far), so even an external kill leaves a parseable
  *     line in stdout;
  *   - build.sbt routes forked stdout through raw pass-through (no sbt
  *     "[info] " prefix), so the line json-parses as printed.
  */
object Bench {

  /** The 2× bar, as a pure function: gates whose measured median
    * exceeds `factor` × their frozen baseline AND by at least
    * `minExcessSec` of absolute wall, with the offending ratio. The
    * absolute floor is what separates a regression from scheduling
    * noise: a 0.2 s-baseline gate swings past 2× on ±0.3 s of JVM/host
    * jitter with byte-identical code (measured round 11 — the bench's
    * own CPU probes moved 1.1–1.3× between closing runs and the
    * "offenders" reproduced solo at baseline shape), while a real plan
    * regression on any gate that matters clears a 1 s excess easily.
    * Gates without a baseline entry (new this round) cannot trip.
    * Spec-pinned (`BenchTripwireSpec`): fires on an artificially
    * slowed gate, silent otherwise.
    */
  def tripwire(
      results: Map[String, Double],
      baseline: Map[String, Double],
      factor: Double = 2.0,
      minExcessSec: Double = 1.0): Map[String, Double] =
    results.flatMap { case (k, v) =>
      baseline.get(k)
        .filter(b => b > 0 && v > factor * b && v - b > minExcessSec)
        .map(b => k -> v / b)
    }

  /** The per-gate statistic the tripwire judges: MIN across full
    * battery passes — the least-contended sample, which is what a
    * plan regression cannot hide below — and NONE when only one pass
    * completed. A single cold pass charges every gate its JIT/codegen
    * warm-up plus the full build cost of cross-gate memos (round 11:
    * the driver's lone 420 s-budget pass read 2.52× baseline with 20
    * phantom "offenders" while every multi-pass run of the identical
    * code read ~1.0×), so no tripwire verdict is computed from it —
    * the artifact stays `{}` and the JSON line carries
    * `"cold_pass":true,"tripwire":"skipped-cold"` instead. With a
    * PARTIAL warm pass (budget-truncated), only the gates it reached —
    * i.e. gates with ≥ 2 samples — are judged; cold-only tail gates
    * are excluded, never judged on their cold sample.
    * Spec-pinned (`BenchTripwireSpec` single-pass + partial-pass cases).
    */
  def tripwireStat(passes: Seq[Map[String, Double]]): Option[Map[String, Double]] = {
    // Only gates measured in ≥ 2 passes enter the stat: with a PARTIAL
    // warm pass (budget-truncated — see the pass loop) a tail gate may
    // hold only its cold pass-1 sample, and judging that sample would
    // re-open the phantom-offender hole the ≥2-pass rule closed.
    val stat =
      if (passes.length < 2) Map.empty[String, Double]
      else passes.flatMap(_.keys).distinct
        .filter(k => passes.count(_.contains(k)) >= 2)
        .map(k => k -> passes.flatMap(_.get(k)).min)
        .toMap
    if (stat.isEmpty) None else Some(stat)
  }

  /** Default frozen-baseline file for a bench dir: the sf1 battery
    * tripwires against its own frozen baseline (`BASELINE_sf1.json`,
    * a quiet-host 3-pass run), everything else against the sf0.1 one.
    * The loader still cross-checks the file's own "sf" field against
    * the dir, so a mismatched override can never silently compare
    * across scales. Spec-pinned (`BenchTripwireSpec`).
    */
  def defaultBaselinePath(sfDir: String): String =
    if (sfDir.stripSuffix("/").endsWith("sf1")) "BASELINE_sf1.json"
    else "BASELINE_sf01.json"

  /** Write the tripwire verdict artifact: `{}` = all gates within the
    * bar; non-empty = the named gates regressed past it.
    */
  def writeTripwire(path: String, offenders: Map[String, Double]): Unit = {
    val json = offenders.toSeq.sortBy(_._1)
      .map { case (k, r) => "\"" + k + "\":" + f"$r%.2f" }
      .mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path), (json + "\n").getBytes("UTF-8"))
    if (offenders.nonEmpty)
      System.err.println(
        s"[bench] TRIPWIRE: ${offenders.size} gate(s) past 2x baseline: " +
          offenders.keys.toSeq.sorted.mkString(", "))
  }

  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - t0) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "420").toDouble
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
    // listing are not billed to the first query. Each load is individually
    // guarded — one broken loader must degrade its own gates, not kill the
    // whole bench before any JSON is emitted (the BENCH_r07/r08 rc=1
    // failure mode: the events loader threw here, outside any try/catch).
    Seq(
      "lineitem" -> (Tables.lineitem _), "orders" -> (Tables.orders _),
      "customer" -> (Tables.customer _), "part" -> (Tables.part _),
      "nation" -> (Tables.nation _), "region" -> (Tables.region _),
      "supplier" -> (Tables.supplier _), "events" -> (Tables.events _),
      "documents" -> (Tables.documents _), "embeddings" -> (Tables.embeddings _))
      .foreach { case (name, load) =>
        // NonFatal, not Throwable: an OutOfMemoryError/LinkageError here
        // means a corrupted JVM — crash loudly instead of timing garbage.
        try load(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] WARMUP FAILED for table $name: ${e.getMessage}")
        }
      }
    // Optional args: run only the named queries (dev loop; the driver
    // passes no args, so its behavior is unchanged).
    val only = args.toSet
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    // Frozen per-gate baseline (BASELINE_sf01.json, committed round 10
    // from the r9 closing 5-pass run): the first per-gate reference on
    // the CURRENT testdata generation — r6 numbers predate the driver's
    // regeneration, so drift before this file could not be attributed
    // between plan regressions and corpus change. Loaded only when its
    // "sf" matches this run's dir; every emit then carries per-gate
    // ratios (this run / baseline) and a common-gate total ratio.
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BASELINE", defaultBaselinePath(sfDir))
    val baseline: Map[String, Double] = try {
      val f = new java.io.File(baselinePath)
      if (!f.isFile) Map.empty
      else {
        import org.json4s._
        val j = jackson.JsonMethods.parse(
          new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
        val sfOk = (j \ "sf") match {
          case JString(s) => sfDir.stripSuffix("/").endsWith(s)
          case _ => false
        }
        if (!sfOk) Map.empty
        else (j \ "queries") match {
          case JObject(fields) => fields.collect {
            case (k, JDouble(v)) => k -> v
            case (k, JInt(v)) => k -> v.toDouble
            case (k, JDecimal(v)) => k -> v.toDouble
          }.toMap
          case _ => Map.empty
        }
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] baseline load failed ($baselinePath): ${e.getMessage}")
      Map.empty
    }
    // Optional extra warm-up pass (SPARK_GRAFT_BENCH_WARMUP=1). Default
    // OFF since round 6: the first timed pass absorbs JIT/codegen cost,
    // and the cross-pass median/min reject that inflation — a separate
    // untimed pass costs ~25% of the battery wall for no extra signal,
    // which is exactly what blew the driver's timeout at 101 gates.
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "0") == "1") {
      ordered.foreach { case (_, fn) =>
        try fn(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(_) => () }
      }
      // Drop everything the warm-up pinned (FPGrowth fits leak persisted
      // freqItemsets RDDs; accumulated caches evict useful ones).
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    // The one cache the POS battery shares by design. Guarded like the
    // warm-up loads: if posify itself breaks, the pos gates fail in their
    // own timed try/catch and the rest of the battery still reports.
    def warmPos(): Unit =
      try {
        val pos = graft.queries.PosQueries.posify(spark, sfDir)
        pos.cache()
        pos.count()
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] WARMUP FAILED for posify: ${e.getMessage}")
      }
    warmPos()
    // Cross-gate memo warm-up (default ON; SPARK_GRAFT_BENCH_MEMO_WARMUP=0
    // to skip): build the battery-shared memos — learned lists, exact-GT
    // panels, PQ/residual codebooks, MinHash signatures, span table —
    // BEFORE pass 1, so a budget-limited run prices gates instead of memo
    // construction. The round-12 driver artifact's lone 420 s-budget pass
    // read 877 s with "cold_pass": most of the excess was these builds
    // charged to whichever gate hit each memo first. The warm-up is
    // inside elapsed(), so the pass-2 budget gate accounts for its cost.
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_MEMO_WARMUP", "1") == "1") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val ms = System.nanoTime()
      // The three modules' memos are independent — build them as
      // concurrent Spark jobs (FIFO over the shared local pool; the
      // small builds fill the cores one alone would leave idle).
      Await.result(Future.sequence(Seq(
        Future(graft.queries.SimQueries.warmMemos(spark, sfDir)),
        Future(graft.queries.DedupQueries.warmMemos(spark, sfDir)),
        Future(graft.queries.TextQueries.warmMemos(spark, sfDir)))), 30.minutes)
      System.err.println(
        f"[bench] memo warm-up done in ${(System.nanoTime() - ms) / 1e9}%.2fs")
    }
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
    require(iters >= 1,
      s"SPARK_GRAFT_BENCH_ITERS must be >= 1 (got $iters): zero passes " +
        "would leave emit() with no times to take a median of")
    // Per-gate progress on stderr (never stdout — that carries the JSON
    // contract line): pinpoints a stuck gate under an external timeout.
    def timeOnce(
        name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      System.err.println(s"[bench] start $name @${fmt2(elapsed())}s")
      val s = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case scala.util.control.NonFatal(_) => -1L }
      val sec = (System.nanoTime() - s) / 1e9
      System.err.println(s"[bench] done  $name ${fmt2(sec)}s")
      sec
    }
    // Contention probes, run before each pass and once at the end:
    //   - scalar: a fixed single-thread integer loop. Constant on a quiet
    //     host; external load inflates it. It is a LOWER BOUND on
    //     interference — a single driver thread cannot see contention
    //     that only degrades multi-core throughput (a few external cores
    //     busy leave it untouched while 32-thread stages slow down).
    //   - mt: the same loop on 8 concurrent threads (wall of the slowest).
    //     Sensitive to partial-core contention the scalar probe misses;
    //     quiet ≈ the scalar time, contended reads higher.
    def probeLoop(): Long = {
      var i = 0L; var acc = 0L
      while (i < 2_000_000_000L) { acc += i & 1023; i += 1 }
      acc
    }
    def probe(): Double = {
      val s = System.nanoTime()
      if (probeLoop() == 42) println("") // defeat dead-code elimination
      (System.nanoTime() - s) / 1e9
    }
    def probeMt(): Double = {
      val s = System.nanoTime()
      val ts = (1 to 8).map { _ =>
        val t = new Thread(() => { if (probeLoop() == 42) println("") })
        t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - s) / 1e9
    }
    // Locale-pinned formatting: f"" interpolators use the default JVM
    // locale, and a comma decimal separator (de_DE, tr_TR) would make
    // the printed line invalid JSON.
    def fmt2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val probes = collection.mutable.ArrayBuffer[Double]()
    val probesMt = collection.mutable.ArrayBuffer[Double]()
    val passes = collection.mutable.ArrayBuffer[Map[String, Double]]()
    // Emit the current best estimate: cross-pass LOWER median (for 2
    // passes that is the min — the warm pass, since pass 1 carries the
    // JIT cost) plus per-gate minima, to file (full precision) and
    // stdout (compact line).
    def emit(): Unit = {
      // passes may be PARTIAL (a warm pass truncated by the budget), so
      // every per-gate statistic folds only the samples that exist;
      // pass 1 is always complete, so every gate has at least one.
      val results = ordered.map { case (name, _) =>
        val times = passes.flatMap(_.get(name)).sorted(Ordering.Double.TotalOrdering)
        name -> times((times.length - 1) / 2)
      }
      val mins = ordered.map { case (name, _) =>
        name -> passes.flatMap(_.get(name)).min
      }.toMap
      val warmGates = ordered.count { case (name, _) =>
        passes.count(_.contains(name)) >= 2
      }
      val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
      // Full-precision, full-name artifact → file. The printed line is
      // size-constrained (see below), so the complete record lives here;
      // committed per-round as BENCH_sf01_r{N}.json / BENCH_sf1_r{N}.json.
      val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val fullMins = results.map { case (k, _) => "\"" + k + "\":" + mins(k) }
        .mkString("{", ",", "}")
      val probesJson = probes.mkString("[", ",", "]")
      val probesMtJson = probesMt.mkString("[", ",", "]")
      // Delta-vs-baseline: per-gate ratio this-run/baseline over the
      // gate intersection, plus the common-gate total ratio. Gates
      // without a baseline entry (new this round) are simply absent.
      val common = results.filter { case (k, _) => baseline.contains(k) }
      val vsBaseTotal =
        if (common.isEmpty) 0.0
        else common.map(_._2).sum / common.map { case (k, _) => baseline(k) }.sum
      val vsBaseJson = common.map { case (k, v) =>
        "\"" + k + "\":" + fmt2(v / baseline(k))
      }.mkString("{", ",", "}")
      val baseFields =
        if (common.isEmpty) ""
        else s""","vs_baseline":$vsBaseJson,"vs_baseline_total":${fmt2(vsBaseTotal)},"baseline_gates":${common.length}"""
      // "cold" = NO gate has a warm (≥2-pass) sample; a truncated warm
      // pass that covered even part of the battery is not cold — its
      // covered gates carry real min-of-passes signal and the tripwire
      // judges exactly those (tripwireStat's ≥2-pass filter).
      val coldPass = warmGates == 0
      val fullJson =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"queries_min":$fullMins,"probes":$probesJson,"probes_mt":$probesMtJson,"sf":"$sfDir","iters":${passes.length},"cold_pass":$coldPass,"warm_gates":$warmGates,"elapsed_sec":${fmt2(elapsed())}$baseFields}"""
      val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "bench_full.json")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (fullJson + "\n").getBytes("UTF-8"))
      // Self-enforcing 2× bar, judged on the per-gate MIN across passes
      // (tripwireStat) — and ONLY with ≥ 2 passes: a lone cold pass
      // cannot fire phantom offenders (round-11 driver artifact). An
      // empty {} is the positive all-clear, a non-empty map means a
      // regression is trying to ship. Written on every emit so even a
      // killed run leaves the verdict of its completed passes.
      writeTripwire(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_FAILURES", "_bench_failures.json"),
        tripwireStat(passes.toSeq)
          .map(stat => tripwire(stat, baseline))
          .getOrElse(Map.empty))
      // Printed line: collectors that keep only a stdout tail (~2 KB)
      // would truncate 100 full query names × full-precision doubles
      // (~3 KB). Compress to the gate-ID prefix (unique except the two
      // p16 gates, which keep their full names) and centisecond
      // precision: ~1.2 KB. Legend: short key = full name up to the
      // first '_'; bench_full.json has the uncompressed map.
      val prefix = results.map { case (k, _) => k -> k.takeWhile(_ != '_') }.toMap
      val collisions = prefix.values.groupBy(identity).collect {
        case (p, g) if g.size > 1 => p
      }.toSet
      val qs = results.map { case (k, v) =>
        val key = if (collisions(prefix(k))) k else prefix(k)
        "\"" + key + "\":" + fmt2(v)
      }.mkString("{", ",", "}")
      val sfShort = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
      val vsShort =
        if (common.isEmpty) ""
        else s""","vs_baseline":${fmt2(vsBaseTotal)}"""
      // Probe MEDIANS in the compact line: without them a post-hoc
      // reader cannot normalize a contended window's numbers (the
      // round-11 2.52× artifact was unattributable from the line alone).
      def med(xs: Seq[Double]): Double =
        if (xs.isEmpty) 0.0
        else xs.sorted(Ordering.Double.TotalOrdering)((xs.length - 1) / 2)
      val probeFields =
        s""","probe":${fmt2(med(probes.toSeq))},"probe_mt":${fmt2(med(probesMt.toSeq))}"""
      val coldFields =
        if (coldPass) ""","cold_pass":true,"tripwire":"skipped-cold""""
        else s""","warm_gates":$warmGates"""
      println(
        s"""{"metric":"total","value":${fmt2(total)},"unit":"sec","queries":$qs,"sf":"$sfShort","iters":${passes.length}$probeFields$coldFields$vsShort}""")
    }
    var pass = 0
    // Always run pass 1 in full (it is the projection reference). Warm
    // passes (2+) are gated PER GATE, not all-or-nothing: before each
    // gate, its projected wall (cold time × warm factor + 15% headroom)
    // must fit the remaining budget, otherwise the gate is SKIPPED and
    // the pass continues with the cheaper remainder. Gates run in
    // DESCENDING cold-pass cost, so the budget buys warm samples for
    // exactly the gates where a regression clears the tripwire's 1 s
    // absolute floor — the round-15 driver artifact showed the
    // alternative: the all-or-nothing projection didn't fit, iters
    // stayed 1, and the whole battery shipped cold with the tripwire
    // vacuously skipped. A partial warm pass keeps the tripwire live
    // for every gate it reaches (tripwireStat's ≥2-pass filter guards
    // the unreached tail).
    // The 0.7 warm/cold projection is an env override
    // (SPARK_GRAFT_BENCH_WARM_FACTOR) so a contended host window can
    // fall back to the conservative 1.0 projection without a code
    // change (measured warm/cold ≈ 0.67–0.7 across rounds 9–13).
    val warmFactor = sys.env.get("SPARK_GRAFT_BENCH_WARM_FACTOR")
      .map(_.toDouble).getOrElse(0.7)
    while (pass < iters && (pass == 0 || elapsed() + 5.0 < budget)) {
      // Reset accumulated state between passes: gate-internal caches
      // (t4's shingle cache, MLlib leftovers) and evicted/fragmented
      // storage otherwise make later passes measure cache-manager and
      // GC state instead of the query. posify is the one cache the POS
      // battery shares by design — re-warm it after the sweep.
      if (pass > 0) {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        System.gc()
        warmPos()
      }
      probes += probe()
      probesMt += probeMt()
      val cold = passes.headOption.getOrElse(Map.empty[String, Double])
      val order =
        if (pass == 0) ordered
        else ordered.sortBy { case (name, _) => -cold.getOrElse(name, 0.0) }
      val pm = scala.collection.mutable.Map[String, Double]()
      var skipped = 0
      order.foreach { case (name, fn) =>
        val fits = pass == 0 ||
          elapsed() + cold.getOrElse(name, 0.0) * warmFactor * 1.15 + 0.5 < budget
        if (fits) pm(name) = timeOnce(name, fn) else skipped += 1
      }
      if (skipped > 0)
        System.err.println(
          s"[bench] pass ${pass + 1} partial: $skipped gate(s) skipped on budget " +
            s"(${pm.size} measured)")
      passes += pm.toMap
      pass += 1
      emit()
    }
    probes += probe()
    probesMt += probeMt()
    emit()
    // Quiet shutdown, then one final copy of the line AFTER spark.stop():
    // with the context gone nothing else writes to stdout, so the last
    // stdout line of the process is the parseable result.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    emit()
  }
}
