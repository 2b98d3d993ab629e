package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall A/B behind gate `e24_diverse_graph`: on the derived
  * near-clone FAN corpus (8 fan clones per base vector — the jittered-
  * cluster regime where HNSW's select-neighbors heuristic matters),
  * serve the SAME beam walk over (a) the plain top-`keep` kNN graph
  * and (b) the select-neighbors-diversified graph
  * ([[graft.similarity.Ann.knnGraphDiverse]]), and report recall@5 vs
  * brute exact — the two arms whose measured gap the gate prices in.
  *
  * Usage: runMain graft.tools.DiverseProbe [sfDir]
  */
object DiverseProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label", $"embedding")
    val der = graft.operators.Checkpoints.eager(
      graft.queries.SimQueries.derivedFanCorpus(emb))._1
    val n = der.count()
    val corpus = der.select($"vec_id", $"embedding")
    // 100 mid-range originals (bases 100..199): away from the entry
    // ids (lowest 2 per label), so recall measures NAVIGATION, not
    // starting inside the answer's class; 500 hit slots (the r16
    // verdict's statistical-resolution point).
    val panel = corpus.filter(
      $"vec_id" % 8 === 0 && $"vec_id" >= 800 && $"vec_id" < 1600)
    val exact = graft.similarity.Ann
      .bruteTopK(corpus, panel, "vec_id", "embedding", 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("vec_id"))
    val entries = der.select($"label", $"vec_id")
      .withColumn("__r", row_number().over(w)).filter($"__r" <= 2)
      .select($"vec_id".as("bid"))

    def serve(tag: String, edges: DataFrame, beamW: Int, hops: Int): Unit = {
      val (sym, _) = graft.operators.Checkpoints.eager(
        graft.similarity.Ann.symmetrize(edges))
      val t0 = System.nanoTime()
      val beam = graft.similarity.Ann.beamSearchKnn(
        sym, corpus, panel, "vec_id", "embedding", entries,
        beamW, hops, 5, presymmetrized = true)
      beam.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val hits = beam.join(exact.select($"qid", $"bid"), Seq("qid", "bid"),
        "left_semi").count()
      val total = exact.count()
      println(f"""{"probe":"$tag","n":$n,"hits":$hits,"total":$total,"recall":${hits.toDouble / total},"sec":$sec%.2f,"sf":"$sfDir"}""")
    }

    Seq(2, 4).foreach { deg =>
      val plain = graft.similarity.Ann.ivfTopK(
        der, der.select($"vec_id", $"embedding"),
        "vec_id", "embedding", "label", k = deg, nprobe = 2)
      serve(s"plain_top${deg}_b16_h5", plain.select($"qid", $"bid"), 16, 5)
    }
    Seq((16, 4), (16, 6), (24, 6)).foreach { case (kc, kp) =>
      val div = graft.similarity.Ann.knnGraphDiverse(
        der, "vec_id", "embedding", "label", kCand = kc, keep = kp, nprobe = 2)
      val e = graft.operators.Checkpoints.eager(div.select($"qid", $"bid"))._1
      Seq((16, 5), (24, 6)).foreach { case (bw, h) =>
        serve(s"diverse_k${kc}keep${kp}_b${bw}_h$h", e, bw, h)
      }
    }
    spark.stop()
  }
}
