package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe for ANN recall bars: prints recall@5-vs-exact-top-1 hit
  * counts for the PQ configurations the e9/e11/e12 gates pin, so a new
  * gate's bar is set from measured numbers instead of guessed.
  * Usage: runMain graft.tools.RecallProbe <sfDir...>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // Panel width (number of query ids): env SPARK_GRAFT_RECALL_PANEL,
    // default 20 (the historical bars); e14's round-9 bar was set from
    // the 200-wide run.
    val panel = sys.env.getOrElse("SPARK_GRAFT_RECALL_PANEL", "20").toInt
    args.foreach { d =>
      val emb = graft.Tables.embeddings(spark, d)
      val qv = graft.similarity.Ann.quantize(emb, "embedding", "qv")
        .select($"vec_id", $"qv")
      val exact = qv.as("a")
        .join(qv.as("b"), $"a.vec_id" =!= $"b.vec_id")
        .where($"a.vec_id" < panel)
        .select(
          $"a.vec_id".as("qid"), $"b.vec_id".as("bid"),
          graft.functions.Exprs.sqDistLong($"a.qv", $"b.qv").as("d2"))
      val w = Window.partitionBy($"qid").orderBy($"d2", $"bid")
      val exactTop1 = exact
        .withColumn("r", row_number().over(w)).filter($"r" === 1)
        .select($"qid", $"bid")
        .cache()

      // Flat ADC (no IVF) with the FULL-train codebook — the e9 config.
      val fullCents = graft.similarity.Pq
        .train(emb, "vec_id", "embedding", dim = 64, m = 32, k = 16, iters = 4)._2
      val fullCodes = graft.similarity.Pq
        .encode(emb, fullCents, "vec_id", "embedding", dim = 64, m = 32)
      val fullAdc5 = graft.similarity.Pq
        .adcTopK(fullCodes, fullCents, emb.filter($"vec_id" < panel),
          "vec_id", "embedding", dim = 64, m = 32, k = 5)
        .select($"qid", $"bid")
      val hFull = exactTop1.join(fullAdc5, Seq("qid", "bid"), "left_semi").count()
      println(s"[recall] $d FULL-train flat ADC hits=$hFull/$panel")

      val src = graft.similarity.Pq.sampleDeterministic(emb, "vec_id", 200)
      val cents = graft.similarity.Pq
        .train(src, "vec_id", "embedding", dim = 64, m = 32, k = 16, iters = 4)._2
      val codes = graft.similarity.Pq
        .encode(emb, cents, "vec_id", "embedding", dim = 64, m = 32)
      // Flat ADC with the sampled codebook — the e11 config.
      val sampAdc5 = graft.similarity.Pq
        .adcTopK(codes, cents, emb.filter($"vec_id" < panel),
          "vec_id", "embedding", dim = 64, m = 32, k = 5)
        .select($"qid", $"bid")
      val hSamp = exactTop1.join(sampAdc5, Seq("qid", "bid"), "left_semi").count()
      println(s"[recall] $d sampled200 flat ADC hits=$hSamp/$panel")
      Seq(1, 2, 4, 6, 8, 10).foreach { nprobe =>
        val ivf5 = graft.similarity.Pq
          .ivfAdcTopK(codes, cents,
            corpus = emb.select($"vec_id", $"label", $"embedding"),
            queries = emb.filter($"vec_id" < panel),
            "vec_id", "embedding", "label", dim = 64, m = 32, k = 5, nprobe = nprobe)
          .select($"qid", $"bid")
        val h = exactTop1.join(ivf5, Seq("qid", "bid"), "left_semi").count()
        println(s"[recall] $d sampled200 ivf+pq nprobe=$nprobe hits=$h/$panel")
      }

      // Residual tier (e15/e16 config): label lists, sampled residual
      // codebook — A/B against the flat-codebook numbers above at equal
      // nprobe.
      val corpusL = emb.select($"vec_id", $"label", $"embedding")
      val (rcodes0, rcents, coarse) = graft.similarity.Pq.trainSampledResidual(
        corpusL, "vec_id", "embedding", "label",
        dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)
      val rcodes = rcodes0.cache()
      rcodes.count()
      Seq(1, 2, 4, 6, 8, 10).foreach { nprobe =>
        val r5 = graft.similarity.Pq
          .ivfAdcResidualTopK(rcodes, rcents, coarse, corpusL,
            queries = emb.filter($"vec_id" < panel),
            "vec_id", "embedding", "label", dim = 64, m = 32, k = 5, nprobe = nprobe)
          .select($"qid", $"bid")
        val h = exactTop1.join(r5, Seq("qid", "bid"), "left_semi").count()
        println(s"[recall] $d sampled200 RESIDUAL ivf+pq nprobe=$nprobe hits=$h/$panel")
      }
      rcodes.unpersist()

      // Unsupervised tier (e13/e14 config): learned 8-list k-means from
      // the sign-hash init, same sampled codebook.
      val init = emb.withColumn("ibkt",
        when(element_at($"embedding", 1) >= 0, 4).otherwise(0) +
          when(element_at($"embedding", 2) >= 0, 2).otherwise(0) +
          when(element_at($"embedding", 3) >= 0, 1).otherwise(0))
      val lists = graft.similarity.Ann
        .kmeansIterate(init, "vec_id", "embedding", "ibkt", 2)
      val corpusU = emb.join(lists.select($"vec_id", $"list"), Seq("vec_id"))
        .select($"vec_id", $"list", $"embedding")
        .cache()
      corpusU.count()
      Seq(1, 2, 3, 4, 6, 8).foreach { nprobe =>
        val ivf5 = graft.similarity.Pq
          .ivfAdcTopK(codes, cents, corpusU,
            queries = emb.filter($"vec_id" < panel),
            "vec_id", "embedding", "list", dim = 64, m = 32, k = 5, nprobe = nprobe)
          .select($"qid", $"bid")
        val h = exactTop1.join(ivf5, Seq("qid", "bid"), "left_semi").count()
        println(s"[recall] $d sampled200 UNSUP-8list ivf+pq nprobe=$nprobe hits=$h/$panel")
      }
      corpusU.unpersist()
    }
    spark.stop()
  }
}
