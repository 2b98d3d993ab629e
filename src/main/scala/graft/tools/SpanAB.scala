package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** t15_substring_spans / sa4_exact_substring_dedup drift attribution
  * (r16 verdict #5, the BasketAB discipline): both gates crept toward
  * their 2× tripwire over rounds in which their code was untouched —
  * the b1 pattern, where the cause was the container class, not a
  * regression. This probe times each gate's LEGS separately on a solo
  * host so the drift pins to a leg and a cause:
  *
  *   t15: gram materialization (the per-window md5 scan — the
  *        hash-unit-bound leg), duplicated-gram census (map-side
  *        combined agg), dup-position semi-join, island windows + agg.
  *   sa4: slice SA build with retained levels, adjacent-LCP descent,
  *        interval merge + clip, per-document cut (the gate's bench
  *        wall rides a battery memo for the first two — the raw legs
  *        here bound the worst case; the memo-served path is timed as
  *        its own leg).
  *
  * Usage: runMain graft.tools.SpanAB [sfDir] [reps]
  */
object SpanAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
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
    val k = 16

    // ---- the MEMO-SERVED gate path itself (what Bench times on warm
    // passes), with the per-gate Spark JOB count: both gates are
    // tiny-data multi-job chains once the memo serves, so if their
    // walls track njobs × the host's fixed per-job cost, the drift is
    // job-overhead of the container class, not a leg regression.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def gateLeg(name: String, rep: Int): Unit = {
      jobs.set(0)
      val (n, sec) = t(graft.SparkEntry.queries(name)(spark, sfDir).collect().length)
      Thread.sleep(300) // listener drain
      println(f"""{"gate":"$name","rep":$rep,"path":"memo-served","rows":$n,"sec":$sec%.3f,"jobs":${jobs.get},"sf":"$sfDir"}""")
    }
    // Fixed per-job cost probe: trivial two-stage jobs (32-row shuffle
    // + collect — no data work to speak of), warm median.
    def jobProbe(rep: Int): Unit = {
      import spark.implicits._
      val times = (1 to 12).map { _ =>
        t(spark.range(32).repartition(4).agg(sum($"id")).collect()) ._2
      }.sorted
      println(f"""{"probe":"trivial_job","rep":$rep,"median_sec":${times(times.length / 2)}%.3f,"min_sec":${times.head}%.3f}""")
    }
    // warm the gate classes/codegen once, then measure
    gateLeg("t15_substring_spans", 0)
    gateLeg("sa4_exact_substring_dedup", 0)
    (1 to reps).foreach { rep =>
      gateLeg("t15_substring_spans", rep)
      gateLeg("sa4_exact_substring_dedup", rep)
      jobProbe(rep)
    }

    (1 to reps).foreach { rep =>
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

      // ---- t15 legs (raw derivation — the memo path collapses all of
      // this into one driver-rebuilt LocalRelation at bench time)
      val docs = graft.Tables.documents(spark, sfDir)
        .select($"doc_id", $"text")
      val grams = docs
        .filter(length($"text") >= k)
        .select($"doc_id", explode(transform(
          sequence(lit(1L), length($"text").cast("long") - lit(k - 1)),
          i => struct(
            i.as("pos"),
            conv(substring(md5($"text".substr(i.cast("int"), lit(k))), 1, 15), 16, 10)
              .cast("long").as("g")))).as("pg"))
        .select($"doc_id", $"pg.pos".as("pos"), $"pg.g".as("g"))
      val (gramsCk, gtok, _) = graft.operators.Checkpoints.eagerCounted(grams)
      // time the gram scan alone by re-deriving uncheckpointed
      val (nG2, tGramScan) = t(grams.count())
      val (dupgCk, dtok, nDupG) = {
        val (c, tok2, n) = graft.operators.Checkpoints.eagerCounted(
          gramsCk.groupBy($"g").agg(count(lit(1)).as("n"))
            .filter($"n" >= 2).select($"g"))
        (c, tok2, n)
      }
      val (_, tCensus) = t(
        gramsCk.groupBy($"g").agg(count(lit(1)).as("n"))
          .filter($"n" >= 2).count())
      val (nDup, tSemi) = t(
        gramsCk.join(dupgCk, Seq("g"), "left_semi").count())
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
      val (nSpans, tIslands) = t(
        gramsCk.join(dupgCk, Seq("g"), "left_semi")
          .select($"doc_id", $"pos")
          .withColumn("prev", lag($"pos", 1).over(w))
          .withColumn("brk", when($"prev".isNull || $"pos" - $"prev" > k, 1).otherwise(0))
          .withColumn("island", sum($"brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"doc_id", $"island")
          .agg(min($"pos").as("s"), max($"pos").as("e"), count(lit(1)).as("ng"))
          .count())
      gtok.free(); dtok.free()
      println(f"""{"gate":"t15","rep":$rep,"n_grams":$nG2,"t_gram_scan":$tGramScan%.2f,"t_census":$tCensus%.2f,"n_dup_pos":$nDup,"t_semi":$tSemi%.2f,"n_spans":$nSpans,"t_islands":$tIslands%.2f,"sf":"$sfDir"}""")

      // ---- sa4 legs (raw: slice SA + LCP + cut)
      val slice = docs.where($"doc_id" < 50)
      var ix: graft.text.SuffixArray.Index = null
      val (_, tBuild) = t {
        ix = graft.text.SuffixArray.buildIndex(slice, "doc_id", "text",
          retainLevels = true)
        ix.total
      }
      var lcp: org.apache.spark.sql.DataFrame = null
      val (nPairs, tLcp) = t {
        lcp = graft.text.SuffixArray.lcpAdjacent(ix)
        lcp.count()
      }
      val (nCut, tCut) = t(
        graft.text.SuffixArray.removeSpansFromLcp(
          slice, "doc_id", "text", lcp,
          ix.addr.filter(col("code") =!= ix.sepCode)
            .select($"doc_id", $"pos", $"gid"),
          minLen = 16L, np = 32).count())
      println(f"""{"gate":"sa4","rep":$rep,"t_sa_build":$tBuild%.2f,"n_pairs":$nPairs,"t_lcp":$tLcp%.2f,"n_docs":$nCut,"t_cut":$tCut%.2f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
