package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 200-query recall panels for the graph-ANN tier (r16 verdict #2):
  * the e21/e21b/e22 gates judge recall on a 10-query panel — 50 hit
  * slots, where one hop tie flips recall by 2 pp — so the ladder-vs-
  * flat crossover decisions ride that resolution. This probe re-reads
  * both serving arms on a 200-QUERY panel (1 000 hit slots, the r9
  * IVF/PQ discipline) at any scale:
  *
  *   - flat2: e21b's serving config — full-corpus degree-16
  *     symmetrized graph, 2 entries per coarse list, beam 16 / 5 hops;
  *   - ladder: e22b's serving config — rep collapse, 3-layer salted-
  *     rank ladder (degree-8 upper graphs), constant 2-entry start,
  *     descent (beam 16 / 4 hops per layer), layer-0 walk over the
  *     rep graph, clone expansion.
  *
  * Builds are timed separately from serving (the e17/e21b/e22b
  * build/serve discipline). Usage:
  *   runMain graft.tools.GraphRecall200 <sfDir...>
  * Panel width: env SPARK_GRAFT_RECALL_PANEL (default 200).
  */
object GraphRecall200 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val panelN = sys.env.getOrElse("SPARK_GRAFT_RECALL_PANEL", "200").toInt

    args.foreach { d =>
      val emb = graft.Tables.embeddings(spark, d)
        .select($"vec_id", $"label", $"embedding").cache()
      val nVec = emb.count()
      val corpus = emb.select($"vec_id", $"embedding")
      val panel = corpus.filter($"vec_id" < panelN)
      val exact = graft.similarity.Ann
        .bruteTopK(corpus, panel, "vec_id", "embedding", 5).cache()
      val total = exact.count()

      def report(tag: String, beam: org.apache.spark.sql.DataFrame,
          buildSec: Double, serveSec: Double): Unit = {
        val hits = beam.join(exact.select($"qid", $"bid"), Seq("qid", "bid"),
          "left_semi").count()
        println(f"""{"arm":"$tag","n":$nVec,"panel":$panelN,"hits":$hits,"total":$total,"recall":${hits.toDouble / total}%.3f,"build_sec":$buildSec%.1f,"serve_sec":$serveSec%.1f,"sf":"$d"}""")
      }

      // ---- flat2 (e21b serving config) ------------------------------
      locally {
        val t0 = System.nanoTime()
        val (sym, _) = graft.operators.Checkpoints.eager(
          graft.similarity.Ann.symmetrize(graft.similarity.Ann.knnGraph(
            emb, "vec_id", "embedding", "label", 16, 4)))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("label")).orderBy(col("vec_id"))
        val entries = emb.select($"label", $"vec_id")
          .withColumn("__r", row_number().over(w)).filter($"__r" <= 2)
          .select($"vec_id".as("bid")).cache()
        entries.count()
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val beam = graft.similarity.Ann.beamSearchKnn(
          sym, corpus, panel, "vec_id", "embedding", entries,
          16, 5, 5, presymmetrized = true)
        beam.count()
        report("flat2_b16_h5", beam, tBuild, (System.nanoTime() - t1) / 1e9)
      }

      // ---- rep ladder (e22b serving config) --------------------------
      locally {
        val t0 = System.nanoTime()
        val repMap = graft.operators.Checkpoints.eager(
          graft.similarity.Ann.representatives(emb, "vec_id", "embedding"))._1
        val reps = emb.join(
          repMap.where($"vec_id" === $"rep").select($"vec_id"), "vec_id")
        val nR = reps.count()
        val ranks = graft.operators.Checkpoints.eager(
          graft.similarity.Ann.hnswRanks(reps, "vec_id"))._1
        val ranked = reps.join(ranks, "vec_id")
        val uppers = (3 to 1 by -1).map { lyr =>
          val members = ranked
            .filter($"hrank" <= graft.similarity.Ann.layerSize(nR, lyr))
            .select($"vec_id", $"label", $"embedding")
          graft.operators.Checkpoints.eager(graft.similarity.Ann.symmetrize(
            graft.similarity.Ann.knnGraph(
              members, "vec_id", "embedding", "label", 8, 4)))._1
        }
        val edges0 = graft.operators.Checkpoints.eager(
          graft.similarity.Ann.symmetrize(graft.similarity.Ann.knnGraph(
            reps, "vec_id", "embedding", "label", 16, 4)))._1
        val topEntries = ranks.filter($"hrank" <= 2)
          .select($"vec_id".as("bid")).cache()
        topEntries.count()
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val walk = graft.similarity.Ann.hnswSearch(
          uppers :+ edges0, reps.select($"vec_id", $"embedding"), panel,
          "vec_id", "embedding", topEntries,
          beamUpper = 16, hopsUpper = 4, beamWidth = 16, hops = 5, k = 16,
          excludeSelf = false)
        val beam = graft.similarity.Ann.expandClones(walk, repMap, "vec_id", 5)
        beam.count()
        report("ladder_l3_b16", beam, tBuild, (System.nanoTime() - t1) / 1e9)
      }
      emb.unpersist()
      exact.unpersist()
    }
    spark.stop()
  }
}
