package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Scale measurement for the FULL-CORPUS suffix-array build (the sa1/
  * sa2 gates run fixed slices; this is the ×10 stress row): wall and
  * shuffle volume of [[graft.text.SuffixArray.build]] (doubling to
  * full rank distinctness) and `prefixGroups(32)` (5 fixed rounds)
  * over every document at the given scale.
  *
  * Usage: runMain graft.tools.SuffixArrayProbe [sfDir] [char|token|all]
  * The group filter lets the ×100 rung run each tier in its own JVM
  * (a shared JVM would measure shuffle-dir contention between tiers,
  * and ×100 char legs are hour-scale while token legs are minutes).
  */
object SuffixArrayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val group = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val write = new AtomicLong
    val read = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        write.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    })

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).cache()
    val nDocs = docs.count()

    def dirSizeMb(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
        else f.length()
      walk(new java.io.File(dir)) / 1000000L
    }

    def timed(tag: String)(f: => Long): Unit = {
      write.set(0); read.set(0)
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"""{"probe":"$tag","n_docs":$nDocs,"rows":$rows,"sec":$sec%.2f,"shuffle_write_mb":${write.get / 1e6}%.1f,"shuffle_read_mb":${read.get / 1e6}%.1f,"sf":"$sfDir"}""")
    }

    if (group == "char" || group == "all") {
    timed("prefix_groups_32_full") {
      graft.text.SuffixArray.prefixGroups(docs, "doc_id", "text", 32)
        .filter(col("grp_size") > 1).count()
    }
    timed("suffix_array_full") {
      graft.text.SuffixArray.build(docs, "doc_id", "text").count()
    }
    // Round-14: the SA's PAYOFF end to end — build with retained
    // levels, adjacent-pair LCP by binary descent, duplicated spans
    // ≥ 32 cp merged and CUT (Lee et al.'s variable-length exact
    // dedup, gates sa3/sa4 on slices; this is the full-corpus row).
    // Staged so each leg's wall/shuffle is attributable.
    var ix: graft.text.SuffixArray.Index = null
    timed("sa_build_with_levels") {
      ix = graft.text.SuffixArray.buildIndex(docs, "doc_id", "text",
        retainLevels = true)
      println(s"""{"detail":"levels","n":${ix.levels.length},"total":${ix.total}}""")
      ix.total
    }
    var lcp: org.apache.spark.sql.DataFrame = null
    timed("lcp_adjacent_full") {
      lcp = graft.text.SuffixArray.lcpAdjacent(ix)
      lcp.count()
    }
    timed("span_removal_from_lcp_L32") {
      val out = graft.text.SuffixArray
        .removeSpansFromLcp(docs, "doc_id", "text", lcp,
          ix.addr.filter(col("code") =!= ix.sepCode)
            .select(col("doc_id"), col("pos"), col("gid")),
          minLen = 32L, np = 32)
        .agg(count(lit(1)), sum(col("n_removed"))).head()
      println(s"""{"detail":"span_removal","n_docs":${out.getLong(0)},"removed_cp":${out.getLong(1)}}""")
      out.getLong(0)
    }
    }

    if (group == "token" || group == "all" || group == "token-build" ||
        group == "token-full-disk" || group == "token-lcp-resume") {
    // Round-15: TOKEN-SPACE end to end (sa6's full-corpus row —
    // tokenize → SA → LCP → cut duplicated ≥16-TOKEN spans, the shape
    // Lee et al. ship). The char-space legs' blocks are swept first:
    // holding both tiers' retained levels would thrash storage and
    // measure eviction, not the operators.
    // `token-build` is the ×100 rung's disk-bounded variant: the full
    // chain retains ~10 DISK_ONLY level snapshots (each |positions|
    // rows) for the LCP descent — at 156 M positions that plus the LCP
    // shuffle exceeds this container's ~94 GB scratch (measured: the
    // round-16 ×100 attempt died on No-space mid-build). The build
    // without retained levels fits; at cluster scale the levels are
    // per-round lake writes, not executor-local scratch (the r15 note).
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    docs.cache(); docs.count()
    def tokenRows(): org.apache.spark.sql.DataFrame = {
      var trows: org.apache.spark.sql.DataFrame = null
      timed("token_rows_bpe30") {
        val merges = graft.text.BpeTrainer.train(docs, "text", 30)
        val enc = graft.text.BpeTrainer.encode(docs, "doc_id", "text", merges)
        val tr = enc
          .select(col("doc_id"), posexplode(col("tokens")).as(Seq("pos0", "tok")))
          .select(col("doc_id"), (col("pos0") + 1L).as("pos"), col("tok"))
        val dict = graft.operators.GlobalRank.withGlobalRank(
          tr.select(col("tok")).distinct(), "code", nParts = 32, col("tok"))
        val (ck, _, n) = graft.operators.Checkpoints.eagerCounted(
          tr.join(dict, Seq("tok")).select(col("doc_id"), col("pos"), col("code")))
        trows = ck
        n
      }
      trows
    }
    if (group == "token-lcp-resume") {
      // Resume the ×100 FULL chain's LCP + cut legs from a level store
      // whose build leg already completed in a dead JVM (args(2) = the
      // store dir). The BPE re-encode is paid ONLY when the store
      // predates the addr-persist contract: the addressing is then
      // recomputed deterministically (BPE → encode → global ranks, so
      // the gids are bitwise the build's own) and backfilled.
      val store = args(2)
      if (!new java.io.File(s"$store/addr").exists()) {
        val trows = tokenRows()
        timed("token_addr_backfill") {
          val addr = graft.text.SuffixArray.addressingOfRows(
            docs.select(col("doc_id")), trows, "doc_id", sepCode = 0L)
          addr.write.mode("overwrite").parquet(s"$store/addr")
          spark.read.parquet(s"$store/addr").count()
        }
      }
      val tix = graft.text.SuffixArray.loadIndex(spark, store, "doc_id", 0L)
      println(s"""{"detail":"resume","levels":${tix.levels.length},"total":${tix.total},"store_mb":${dirSizeMb(store)}}""")
      // cut-leg shuffles sized like the build's: ~1 M positions/task —
      // session-wide, so the anti-join and the gid equi-join (both
      // corpus-scale at x100) run at the derived width too, exactly
      // the conf a cluster submission would set for this corpus
      val np = math.max(32, (tix.total / 1000000L).toInt)
      spark.conf.set("spark.sql.shuffle.partitions", np.toString)
      var tlcp: org.apache.spark.sql.DataFrame = null
      val lastStep = new java.io.File(s"$store/descent")
      val doneSteps = Option(lastStep.listFiles).getOrElse(Array.empty)
        .map(_.getName).filter(_.startsWith("step="))
        .map(_.stripPrefix("step=").toInt).sorted
      if (doneSteps.lastOption.contains(tix.levels.length - 1)) {
        // the LCP descent's final generation survived a dead JVM —
        // serve the cut leg straight from it
        tlcp = spark.read.parquet(s"$store/descent/step=${doneSteps.last}")
        println(s"""{"detail":"lcp_resume_from_step","step":${doneSteps.last},"rows":${tlcp.count()}}""")
      } else {
        timed("token_lcp_adjacent_full") {
          tlcp = graft.text.SuffixArray.lcpAdjacent(tix)
          tlcp.count()
        }
      }
      timed("token_span_removal_L16") {
        val kept = graft.text.SuffixArray
          .removeTokenSpansFromLcp(
            tix.addr.filter(col("code") =!= lit(0L))
              .select(col("doc_id"), col("pos"), col("gid"), col("code")),
            "doc_id", tlcp, minLen = 16L, np = np)
          .agg(count(lit(1))).head().getLong(0)
        println(s"""{"detail":"token_span_removal","kept_tokens":$kept}""")
        kept
      }
      spark.stop()
      return
    }
    val trows: org.apache.spark.sql.DataFrame = tokenRows()
    if (group == "token-build") {
      timed("token_sa_build_no_levels") {
        graft.text.SuffixArray.buildIndexFromRows(
          docs.select(col("doc_id")), trows, "doc_id", sepCode = 0L,
          retainLevels = false).total
      }
      spark.stop()
      return
    }
    if (group == "token-full-disk") {
      // The r16 verdict's #3: the ×100 FULL chain (build WITH levels →
      // LCP → cut), disk-bounded — levels as compressed lake parquet
      // generations instead of block-manager scratch (the No-space
      // killer), build shuffles at the scale-DERIVED partition count
      // (the 24 g-heap OOM killer). Runs at the default heap.
      val store = s"/tmp/sa-levels-${System.nanoTime()}"
      var tix: graft.text.SuffixArray.Index = null
      timed("token_sa_build_levels_lake") {
        tix = graft.text.SuffixArray.buildIndexFromRows(
          docs.select(col("doc_id")), trows, "doc_id", sepCode = 0L,
          retainLevels = true, levelStore = Some(store))
        println(s"""{"detail":"token_levels_lake","n":${tix.levels.length},"total":${tix.total},"store_mb":${dirSizeMb(store)}}""")
        tix.total
      }
      var tlcp: org.apache.spark.sql.DataFrame = null
      timed("token_lcp_adjacent_full") {
        tlcp = graft.text.SuffixArray.lcpAdjacent(tix)
        tlcp.count()
      }
      timed("token_span_removal_L16") {
        val kept = graft.text.SuffixArray
          .removeTokenSpansFromLcp(
            tix.addr.filter(col("code") =!= lit(0L))
              .select(col("doc_id"), col("pos"), col("gid"), col("code")),
            "doc_id", tlcp, minLen = 16L, np = 32)
          .agg(count(lit(1))).head().getLong(0)
        println(s"""{"detail":"token_span_removal","kept_tokens":$kept}""")
        kept
      }
      spark.stop()
      return
    }
    var tix: graft.text.SuffixArray.Index = null
    timed("token_sa_build_with_levels") {
      tix = graft.text.SuffixArray.buildIndexFromRows(
        docs.select(col("doc_id")), trows, "doc_id", sepCode = 0L,
        retainLevels = true)
      println(s"""{"detail":"token_levels","n":${tix.levels.length},"total":${tix.total}}""")
      tix.total
    }
    var tlcp: org.apache.spark.sql.DataFrame = null
    timed("token_lcp_adjacent_full") {
      tlcp = graft.text.SuffixArray.lcpAdjacent(tix)
      tlcp.count()
    }
    timed("token_span_removal_L16") {
      val kept = graft.text.SuffixArray
        .removeTokenSpansFromLcp(
          tix.addr.filter(col("code") =!= lit(0L))
            .select(col("doc_id"), col("pos"), col("gid"), col("code")),
          "doc_id", tlcp, minLen = 16L, np = 32)
        .agg(count(lit(1))).head().getLong(0)
      println(s"""{"detail":"token_span_removal","kept_tokens":$kept}""")
      kept
    }
    }
    spark.stop()
  }
}
