package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement main for the kNN-graph probe dial (PLANS.md evidence):
  * recall@k of [[graft.similarity.Ann.knnGraph]] against the exact
  * cosine top-k graph over a query panel, for BOTH coarse-list
  * choices — the driver's labels and LEARNED lists
  * ([[graft.similarity.Ann.kmeansIterate]] from a sign-hash init, the
  * e13 no-label path). This is the experiment behind the e19 scaladoc
  * claim that a learned quantizer is the fix for weakly cosine-aligned
  * buckets.
  *
  * Usage: runMain graft.tools.KnnGraphProbe [sfDir] [panel] [k]
  * Output: one JSON line per (lists, nprobe).
  */
object KnnGraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val panel = if (args.length > 1) args(1).toInt else 200
    val k = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = graft.Tables.embeddings(spark, sfDir).cache()
    emb.count()

    // Exact cosine top-k graph over the panel (the ground truth).
    val q = emb.filter($"vec_id" < panel)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val b = emb.select($"vec_id".as("bid"), $"embedding".as("bv"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"bid")
    val exact = broadcast(q).crossJoin(b)
      .filter($"qid" =!= $"bid")
      .select($"qid", $"bid",
        round(graft.functions.Exprs.cosine($"qv", $"bv"), 6).as("cosine"))
      .withColumn("r", row_number().over(w)).filter($"r" <= k)
      .select($"qid", $"bid")
      .cache()
    val nExact = exact.count()

    // Learned lists: sign-hash init on three coordinates (the e13
    // no-label recipe), 2 engine-exact Lloyd rounds, 8..10 lists.
    val signInit =
      element_at($"embedding", 1).geq(0f).cast("int") * 4 +
        element_at($"embedding", 2).geq(0f).cast("int") * 2 +
        element_at($"embedding", 3).geq(0f).cast("int")
    val learned = graft.similarity.Ann
      .kmeansIterate(emb.withColumn("ibkt", signInit), "vec_id", "embedding", "ibkt", 2)
      .select($"vec_id", $"list")
    val withLearned = emb.join(learned, Seq("vec_id"))
      .select($"vec_id", $"list", $"embedding").cache()
    withLearned.count()

    def recall(corpus: DataFrame, listCol: String, nprobe: Int): Long = {
      val g = graft.similarity.Ann
        .knnGraph(corpus, "vec_id", "embedding", listCol, k, nprobe)
        .filter($"qid" < panel)
        .select($"qid", $"bid")
      exact.join(g, Seq("qid", "bid"), "left_semi").count()
    }
    val labelCorpus = emb.select($"vec_id", $"label", $"embedding")
    Seq(1, 2, 4, 6).foreach { np =>
      val hL = recall(labelCorpus, "label", np)
      val hK = recall(withLearned, "list", np)
      println(
        s"""{"nprobe":$np,"n_exact":$nExact,"label_hits":$hL,"learned_hits":$hK,""" +
          s""""label_recall":${hL.toDouble / nExact},"learned_recall":${hK.toDouble / nExact}}""")
    }
    spark.stop()
  }
}
