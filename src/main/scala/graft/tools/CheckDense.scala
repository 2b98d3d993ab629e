package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: codebook density check (all m·k codewords present?) for the
  * gate PQ configs — the packed-LUT layout relies on it.
  */
object CheckDense {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val emb = graft.Tables.embeddings(spark, d)
      val full = graft.similarity.Pq.train(emb, "vec_id", "embedding", 64, 32, 16, 4)._2.count()
      val samp = graft.similarity.Pq
        .trainSampled(emb, "vec_id", "embedding", 64, 32, 16, 4, 200)._2.count()
      val res = graft.similarity.Pq.trainSampledResidual(
        emb.select(col("vec_id"), col("label"), col("embedding")),
        "vec_id", "embedding", "label", 64, 32, 16, 4, 200)._2.count()
      println(s"DENSE $d full=$full sampled=$samp residual=$res expected=${32 * 16}")
    }
    spark.stop()
  }
}
