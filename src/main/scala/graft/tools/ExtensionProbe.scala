package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Scale measurement for the round-15-extension operators — the gates
  * run fixed panels / bounded models; these are the full-corpus ×10
  * stress rows: wall + shuffle volume of
  *
  *   - `QualityModel.train` (pocket perceptron, B=1024, 16 epochs)
  *     over every document, plus one serving pass of the result;
  *   - `Ann.knnGraph` at serving degree (k=16, nprobe=4) over every
  *     embedding, then `Ann.beamSearchKnn` (beam 16, 5 hops) on the
  *     10-query panel against the built graph;
  *   - `Sampling.weightedSample` (A-ES top-100 by token mass).
  *
  * Usage: runMain graft.tools.ExtensionProbe [sfDir]
  */
object ExtensionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    // Optional 2nd arg: one of all|distill|graph|sample|unigram — runs
    // just that section (the ×100 rung runs the graph legs in their
    // own JVM; the unigram/distill legs there would add an hour).
    val section = if (args.length > 1) args(1) else "all"
    def on(name: String): Boolean = section == "all" || section == name
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

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
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).cache()
    val nVec = emb.count()

    def timed(tag: String, n: Long)(f: => Long): Unit = {
      write.set(0); read.set(0)
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"""{"probe":"$tag","n":$n,"rows":$rows,"sec":$sec%.2f,"shuffle_write_mb":${write.get / 1e6}%.1f,"shuffle_read_mb":${read.get / 1e6}%.1f,"sf":"$sfDir"}""")
    }

    // --- in-engine training (t40's operator at corpus scale) --------
    val nStop = size(filter(split($"text", " "),
      x => x === "the" || x === "a")).cast("long")
    val nTok = graft.functions.Exprs.tokenCount($"text")
    val labeled = docs.select($"doc_id", $"text",
      when(nTok >= 30 && nStop * 5 < nTok, 1L).otherwise(-1L).as("y")).cache()
    if (on("distill")) {
    labeled.count()
    var w: Array[Long] = null
    timed("distill_train_b1024_e16", nDocs) {
      w = graft.text.QualityModel.train(labeled, "doc_id", "text", "y", 1024, 16)
      w.count(_ != 0L).toLong
    }
    timed("distill_serve_full", nDocs) {
      graft.text.QualityModel.classifyWithModel(docs, "doc_id", "text", 1024,
        graft.text.QualityModel.weightsTable(spark, w))
        .agg(sum(col("kept"))).head().getLong(0)
    }
    }

    if (on("graph")) {
    // --- graph ANN: build at serving degree, then the panel search ---
    var graph: org.apache.spark.sql.DataFrame = null
    timed("knn_graph_k16_np4", nVec) {
      val (g, _) = graft.operators.Checkpoints.eager(
        graft.similarity.Ann.knnGraph(emb, "vec_id", "embedding", "label", 16, 4))
      graph = g
      g.count()
    }
    val panel = emb.select($"vec_id", $"embedding").filter($"vec_id" < 10)
    val entries = emb.groupBy($"label").agg(min($"vec_id").as("bid")).select($"bid")
    var beam: org.apache.spark.sql.DataFrame = null
    timed("beam_search_10q_b16_h5", nVec) {
      beam = graft.similarity.Ann.beamSearchKnn(
        graph, emb.select($"vec_id", $"embedding"), panel,
        "vec_id", "embedding", entries, 16, 5, 5)
      beam.count()
    }
    // recall@5 vs exact at THIS scale (the RecallProbe readout — the
    // gate panel prices recall into the hash only at the gate scales;
    // this is the ×10 row the r15 verdict asked for)
    locally {
      val exact = graft.similarity.Ann.bruteTopK(
        emb.select($"vec_id", $"embedding"), panel, "vec_id", "embedding", 5)
      val hits = beam.join(exact.select($"qid", $"bid"), Seq("qid", "bid"), "left_semi")
        .count()
      val total = exact.count()
      println(s"""{"probe":"beam_recall_at_5","hits":$hits,"total":$total,"recall":${hits.toDouble / total},"sf":"$sfDir"}""")
    }
    // ENTRY-SPREAD sweep (r15 verdict #6): if recall sags at scale,
    // spread the starts — E entries per coarse list (lowest E ids)
    // instead of one, before reaching for upper layers.
    Seq(2, 4).foreach { e =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("label")).orderBy(col("vec_id"))
      val entriesE = emb.select(col("label"), col("vec_id"))
        .withColumn("__r", row_number().over(w)).filter(col("__r") <= e)
        .select(col("vec_id").as("bid"))
      val t0 = System.nanoTime()
      val beamE = graft.similarity.Ann.beamSearchKnn(
        graph, emb.select($"vec_id", $"embedding"), panel,
        "vec_id", "embedding", entriesE, 16, 5, 5)
      beamE.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val exact = graft.similarity.Ann.bruteTopK(
        emb.select($"vec_id", $"embedding"), panel, "vec_id", "embedding", 5)
      val hits = beamE.join(exact.select($"qid", $"bid"), Seq("qid", "bid"), "left_semi")
        .count()
      val total = exact.count()
      println(f"""{"probe":"beam_recall_entries_$e","hits":$hits,"total":$total,"recall":${hits.toDouble / total},"sec":$sec%.2f,"sf":"$sfDir"}""")
    }
    // SERVING from the prebuilt symmetric edge index (the e21b path):
    // symmetrize once at "build time" (not billed), then the walk alone
    // — the wall a server pays per query batch.
    val (symEdges, _) = graft.operators.Checkpoints.eager(
      graft.similarity.Ann.symmetrize(graph))
    timed("beam_serving_presym_10q_b16_h5", nVec) {
      graft.similarity.Ann.beamSearchKnn(
        symEdges, emb.select($"vec_id", $"embedding"), panel,
        "vec_id", "embedding", entries, 16, 5, 5,
        presymmetrized = true).count()
    }

    // --- HNSW layer ladder (the e22 tier) ----------------------------
    // Flat entry sets grow with the corpus: 2 per coarse list =
    // 2·lists hop-0 rescores per query (×100 corpora = 1 000 lists =
    // 2 000 starts). The descent starts at a CONSTANT 2 and pays
    // ≤ beam·(degree+1)·hops per upper layer. Probe both serving arms
    // over the SAME prebuilt symmetric layer-0 edges, plus the ladder
    // build, plus recall — the crossover measurement behind e22.
    locally {
      val corpus = emb.select($"vec_id", $"embedding")
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("label")).orderBy(col("vec_id"))
      val flatEntries = emb.select(col("label"), col("vec_id"))
        .withColumn("__r", row_number().over(w2)).filter(col("__r") <= 2)
        .select(col("vec_id").as("bid"))
      timed("beam_serving_flat2_10q", nVec) {
        graft.similarity.Ann.beamSearchKnn(
          symEdges, corpus, panel, "vec_id", "embedding", flatEntries,
          16, 5, 5, presymmetrized = true).count()
      }
      // The e22 gate shape: dedup to duplicate-class representatives
      // (the exact-clone navigability fix — HnswSweep rows), ladder +
      // graphs over reps, self-exclusion-off walk, exact expansion.
      var repMap: org.apache.spark.sql.DataFrame = null
      var reps: org.apache.spark.sql.DataFrame = null
      var ranks: org.apache.spark.sql.DataFrame = null
      var uppers: Seq[org.apache.spark.sql.DataFrame] = null
      var edges0: org.apache.spark.sql.DataFrame = null
      timed("hnsw_ladder_build_l3", nVec) {
        repMap = graft.operators.Checkpoints.eager(
          graft.similarity.Ann.representatives(emb, "vec_id", "embedding"))._1
        reps = emb.join(
          repMap.where(col("vec_id") === col("rep")).select("vec_id"), "vec_id")
        val nR = reps.count()
        ranks = graft.operators.Checkpoints.eager(
          graft.similarity.Ann.hnswRanks(reps, "vec_id"))._1
        val ranked = reps.join(ranks, "vec_id")
        uppers = (3 to 1 by -1).map { lyr =>
          val members = ranked
            .filter(col("hrank") <= graft.similarity.Ann.layerSize(nR, lyr))
            .select(col("vec_id"), col("label"), col("embedding"))
          graft.operators.Checkpoints.eager(graft.similarity.Ann.symmetrize(
            graft.similarity.Ann.knnGraph(
              members, "vec_id", "embedding", "label", 8, 4)))._1
        }
        edges0 = graft.operators.Checkpoints.eager(
          graft.similarity.Ann.symmetrize(graft.similarity.Ann.knnGraph(
            reps, "vec_id", "embedding", "label", 16, 4)))._1
        uppers.map(_.count()).sum + edges0.count()
      }
      var hbeam: org.apache.spark.sql.DataFrame = null
      timed("hnsw_serving_10q_b16_h5", nVec) {
        val walk = graft.similarity.Ann.hnswSearch(
          uppers :+ edges0, reps.select(col("vec_id"), col("embedding")),
          panel, "vec_id", "embedding",
          topEntries = ranks.filter(col("hrank") <= 2)
            .select(col("vec_id").as("bid")),
          beamUpper = 16, hopsUpper = 4, beamWidth = 16, hops = 5, k = 16,
          excludeSelf = false)
        hbeam = graft.similarity.Ann.expandClones(walk, repMap, "vec_id", 5)
        hbeam.count()
      }
      val exact = graft.similarity.Ann.bruteTopK(corpus, panel,
        "vec_id", "embedding", 5)
      val hits = hbeam.join(exact.select($"qid", $"bid"), Seq("qid", "bid"),
        "left_semi").count()
      val total = exact.count()
      println(s"""{"probe":"hnsw_recall_at_5","hits":$hits,"total":$total,"recall":${hits.toDouble / total},"sf":"$sfDir"}""")

      // PREBUILT-ARTIFACT serving (the e22b path): persist the whole
      // rep ladder — repmap, rep corpus, per-layer symmetrized edges,
      // entries — as parquet (billed as the index build), then time
      // serving purely from the stored tables. The r16 serving leg
      // above re-derives reps/ladder per walk (a join plan, not an
      // index — 1.1 GB shuffled at ×100); this row is the same walk
      // with that re-derivation gone.
      val idxDir = graft.TempDirs.create("graft-probe-hnswidx-")
        .toFile.getAbsolutePath
      timed("hnsw_index_persist_l3", nVec) {
        repMap.write.mode("overwrite").parquet(s"$idxDir/repmap")
        reps.write.mode("overwrite").parquet(s"$idxDir/reps")
        uppers.zip(3 to 1 by -1).foreach { case (u, lyr) =>
          u.write.mode("overwrite").parquet(s"$idxDir/layers/l$lyr")
        }
        edges0.write.mode("overwrite").parquet(s"$idxDir/edges0")
        ranks.filter(col("hrank") <= 2).select(col("vec_id").as("bid"))
          .write.mode("overwrite").parquet(s"$idxDir/entries")
        nVec
      }
      timed("hnsw_serving_prebuilt_10q", nVec) {
        val sRepMap = spark.read.parquet(s"$idxDir/repmap")
        val sReps = spark.read.parquet(s"$idxDir/reps")
          .select(col("vec_id"), col("embedding"))
        val sUppers = (3 to 1 by -1)
          .map(l => spark.read.parquet(s"$idxDir/layers/l$l"))
        val sEdges0 = spark.read.parquet(s"$idxDir/edges0")
        val sEntries = spark.read.parquet(s"$idxDir/entries")
        val walk = graft.similarity.Ann.hnswSearch(
          sUppers :+ sEdges0, sReps, panel, "vec_id", "embedding", sEntries,
          beamUpper = 16, hopsUpper = 4, beamWidth = 16, hops = 5, k = 16,
          excludeSelf = false)
        graft.similarity.Ann.expandClones(walk, sRepMap, "vec_id", 5).count()
      }
    }
    }

    if (on("line")) {
    // --- corpus-level line dedup (t42's operator at corpus scale) ---
    // The derived-scale corpora are clone corpora (ScaleUp keeps text,
    // shifts ids), so at ×100 the page derivation yields ~100 copies
    // of every BODY line and 500 k copies of the global footer — the
    // hot-key stress the census design exists for: min(struct) folds
    // the hottest line per-partition before the exchange, where a
    // row_number-over-line window would put all its copies in one task.
    val pages = graft.Tables.documents(spark, sfDir).select($"doc_id",
      concat(
        lit("HEADER "), $"source", lit(" :: all rights reserved\n"),
        $"text", lit("\n"),
        lit("SHARE subscribe to "), $"source", lit(" newsletter today\n"),
        lit("COPYRIGHT footer common to every page of the crawl")).as("page"))
    timed("line_dedup_pages", nDocs) {
      val out = graft.text.TextOps.dedupLines(pages, "doc_id", "page", 30)
        .agg(count(lit(1)), sum($"n_kept")).head()
      println(s"""{"detail":"line_dedup","n_docs":${out.getLong(0)},"kept_lines":${out.getLong(1)}}""")
      out.getLong(0)
    }
    }

    if (on("sample")) {
    // --- weighted sampling ------------------------------------------
    timed("weighted_sample_100", nDocs) {
      graft.operators.Sampling.weightedSample(
        docs.select($"doc_id", nTok.as("n_tokens")),
        "doc_id", "n_tokens", "ws1", 100).count()
    }
    }

    if (on("unigram")) {
    // --- unigram-LM tokenizer (t41's operator at corpus scale; the
    // DP unroll adapts to the corpus' max word length — the ×10
    // derivation suffixes tokens, growing words past the gate's 8) ---
    val maxW = docs
      .select(max(size(split(col("text"), " "))).as("nw"),
        max(expr("array_max(transform(split(text, ' '), w -> length(w)))")).as("lw"))
      .select(greatest(col("lw"), lit(8)).cast("int")).head().getInt(0)
    var uniScores: org.apache.spark.sql.DataFrame = null
    timed(s"unigram_train_em1_w$maxW", nDocs) {
      uniScores = graft.text.UnigramLm.train(docs, "text",
        maxWordLen = maxW, maxPiece = 4, emRounds = 1)
      uniScores.count()
    }
    timed(s"unigram_encode_full_w$maxW", nDocs) {
      graft.text.UnigramLm.encode(docs, "doc_id", "text", uniScores, maxW, 4)
        .agg(sum(col("n_pieces"))).head().getLong(0)
    }
    // t41b's operator at corpus scale: one EM round + rescore + the
    // loss-delta prune (alt DP over the VOCABULARY) + renormalize —
    // flat ×10 expected, everything after the word-type collapse is
    // types-sized.
    timed(s"unigram_prune_f50_w$maxW", nDocs) {
      graft.text.UnigramLm.trainPruned(docs, "text", maxW, 4,
        pruneRounds = 1, pruneFrac = 0.5).count()
    }
    }

    spark.stop()
  }
}
