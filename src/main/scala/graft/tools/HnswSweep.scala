package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/wall sweep for the e22 layer-descent parameters at a derived
  * scale — the measurement behind the upper-walk configuration. Arms:
  *   - flat2: the e21b serving reference (2 entries per coarse list)
  *   - noladder: layer-0 walk from the 2 global top-ranked entries
  *     (isolates "did the descent help at all")
  *   - (beamUpper, hopsUpper) grid for the full 3-layer descent
  *
  * Usage: runMain graft.tools.HnswSweep [sfDir]
  */
object HnswSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/derived/sf1c"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).cache()
    val nVec = emb.count()
    val corpus = emb.select($"vec_id", $"embedding")
    val panel = corpus.filter($"vec_id" < 10)
    val exact = graft.similarity.Ann.bruteTopK(corpus, panel,
      "vec_id", "embedding", 5).cache()
    val total = exact.count()

    val (symEdges, _) = graft.operators.Checkpoints.eager(
      graft.similarity.Ann.symmetrize(graft.similarity.Ann.knnGraph(
        emb, "vec_id", "embedding", "label", 16, 4)))

    def recallOf(beam: org.apache.spark.sql.DataFrame, tag: String, sec: Double): Unit = {
      val hits = beam.join(exact.select($"qid", $"bid"), Seq("qid", "bid"),
        "left_semi").count()
      println(f"""{"arm":"$tag","hits":$hits,"total":$total,"recall":${hits.toDouble / total}%.2f,"sec":$sec%.2f,"sf":"$sfDir"}""")
    }

    // flat reference
    locally {
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("label")).orderBy(col("vec_id"))
      val flatEntries = emb.select(col("label"), col("vec_id"))
        .withColumn("__r", row_number().over(w2)).filter(col("__r") <= 2)
        .select(col("vec_id").as("bid"))
      val t0 = System.nanoTime()
      val b = graft.similarity.Ann.beamSearchKnn(symEdges, corpus, panel,
        "vec_id", "embedding", flatEntries, 16, 5, 5, presymmetrized = true)
      b.count()
      recallOf(b, "flat2", (System.nanoTime() - t0) / 1e9)
    }

    val ranks = graft.operators.Checkpoints.eager(
      graft.similarity.Ann.hnswRanks(emb, "vec_id"))._1
    val topEntries = ranks.filter(col("hrank") <= 2).select(col("vec_id").as("bid"))

    // no-ladder control: layer-0 walk straight from the global entries
    locally {
      val t0 = System.nanoTime()
      val b = graft.similarity.Ann.beamSearchKnn(symEdges, corpus, panel,
        "vec_id", "embedding", topEntries, 16, 5, 5, presymmetrized = true)
      b.count()
      recallOf(b, "noladder_h5", (System.nanoTime() - t0) / 1e9)
    }
    locally {
      val t0 = System.nanoTime()
      val b = graft.similarity.Ann.beamSearchKnn(symEdges, corpus, panel,
        "vec_id", "embedding", topEntries, 16, 10, 5, presymmetrized = true)
      b.count()
      recallOf(b, "noladder_h10", (System.nanoTime() - t0) / 1e9)
    }

    val ranked = emb.join(ranks, "vec_id")
    val uppers = (3 to 1 by -1).map { lyr =>
      val members = ranked
        .filter(col("hrank") <= graft.similarity.Ann.layerSize(nVec, lyr))
        .select(col("vec_id"), col("label"), col("embedding"))
      graft.operators.Checkpoints.eager(graft.similarity.Ann.symmetrize(
        graft.similarity.Ann.knnGraph(
          members, "vec_id", "embedding", "label", 8, 4)))._1
    }
    Seq((2, 2), (4, 2), (8, 2), (8, 4), (16, 4)).foreach { case (bu, hu) =>
      val t0 = System.nanoTime()
      val b = graft.similarity.Ann.hnswSearch(
        uppers :+ symEdges, corpus, panel, "vec_id", "embedding",
        topEntries, beamUpper = bu, hopsUpper = hu,
        beamWidth = 16, hops = 5, k = 5)
      b.count()
      recallOf(b, s"ladder_b${bu}_h$hu", (System.nanoTime() - t0) / 1e9)
    }

    // DIVERSIFIED upper layers (HNSW select-neighbors, kCand 64 ≥ the
    // ×100 clone multiplicity): the navigability fix for clone-clique
    // layer graphs — same walks, different edges.
    var divBuild = 0.0
    val dUppers = {
      val t0 = System.nanoTime()
      val r = (3 to 1 by -1).map { lyr =>
        val members = ranked
          .filter(col("hrank") <= graft.similarity.Ann.layerSize(nVec, lyr))
          .select(col("vec_id"), col("label"), col("embedding"))
        graft.operators.Checkpoints.eager(graft.similarity.Ann.symmetrize(
          graft.similarity.Ann.knnGraphDiverse(
            members, "vec_id", "embedding", "label",
            kCand = 64, keep = 8, nprobe = 4)))._1
      }
      r.foreach(_.count())
      divBuild = (System.nanoTime() - t0) / 1e9
      println(f"""{"arm":"diverse_ladder_build","sec":$divBuild%.2f,"sf":"$sfDir"}""")
      r
    }
    Seq((8, 2), (16, 4)).foreach { case (bu, hu) =>
      val t0 = System.nanoTime()
      val b = graft.similarity.Ann.hnswSearch(
        dUppers :+ symEdges, corpus, panel, "vec_id", "embedding",
        topEntries, beamUpper = bu, hopsUpper = hu,
        beamWidth = 16, hops = 5, k = 5)
      b.count()
      recallOf(b, s"divladder_b${bu}_h$hu", (System.nanoTime() - t0) / 1e9)
    }

    // REPRESENTATIVE ladder (the e22 gate shape): dedup to distinct
    // vectors, ladder + graphs over reps, walk with self-exclusion off,
    // exact clone expansion at the end. Exact clones are what caps the
    // (even diversified) full-corpus ladder above.
    locally {
      val t0 = System.nanoTime()
      val repMap = graft.operators.Checkpoints.eager(
        graft.similarity.Ann.representatives(emb, "vec_id", "embedding"))._1
      val reps = emb.join(
        repMap.where(col("vec_id") === col("rep")).select("vec_id"), "vec_id")
      val nR = reps.count()
      val rRanks = graft.operators.Checkpoints.eager(
        graft.similarity.Ann.hnswRanks(reps, "vec_id"))._1
      val rRanked = reps.join(rRanks, "vec_id")
      val rUppers = (3 to 1 by -1).map { lyr =>
        val members = rRanked
          .filter(col("hrank") <= graft.similarity.Ann.layerSize(nR, lyr))
          .select(col("vec_id"), col("label"), col("embedding"))
        graft.operators.Checkpoints.eager(graft.similarity.Ann.symmetrize(
          graft.similarity.Ann.knnGraph(
            members, "vec_id", "embedding", "label", 8, 4)))._1
      }
      val rEdges0 = graft.operators.Checkpoints.eager(
        graft.similarity.Ann.symmetrize(graft.similarity.Ann.knnGraph(
          reps, "vec_id", "embedding", "label", 16, 4)))._1
      println(f"""{"arm":"repladder_build","n_reps":$nR,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"sf":"$sfDir"}""")
      val t1 = System.nanoTime()
      val walk = graft.similarity.Ann.hnswSearch(
        rUppers :+ rEdges0, reps.select(col("vec_id"), col("embedding")),
        panel, "vec_id", "embedding",
        rRanks.filter(col("hrank") <= 2).select(col("vec_id").as("bid")),
        beamUpper = 16, hopsUpper = 4, beamWidth = 16, hops = 5, k = 16,
        excludeSelf = false)
      val beam = graft.similarity.Ann.expandClones(walk, repMap, "vec_id", 5)
      beam.count()
      recallOf(beam, "repladder_b16_h4", (System.nanoTime() - t1) / 1e9)
    }
    spark.stop()
  }
}
