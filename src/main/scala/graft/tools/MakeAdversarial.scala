package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-only adversarial corpus for the t15/t17 hot-gram bound: the
  * same 30-char boilerplate string is prepended to HALF the documents,
  * so one gram digest occurs in 50% of the corpus — the skewed-text
  * shape (license headers, nav bars) that a per-gram occurrence roster
  * chokes on. Usage: runMain graft.tools.MakeAdversarial <srcSf> <out>
  * — writes documents.parquet only (the t-gates' sole input).
  */
object MakeAdversarial {
  // exactly 30 chars — one full gram window
  val Boiler = "== COMMON LICENSE HEADER v1 =="

  def main(args: Array[String]): Unit = {
    require(Boiler.length == 30)
    val (src, out) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$src/documents.parquet")
      .withColumn(
        "text",
        when(col("doc_id") % 2 === 0, concat(lit(Boiler), lit(" "), col("text")))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // Bench preloads EVERY table unconditionally, so the adversarial dir
    // must be a complete sf dir: copy the untouched tables through as-is
    // (raw file copy — no Spark job, no row rewrite).
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings").foreach { t =>
      val from = new org.apache.hadoop.fs.Path(s"$src/$t.parquet")
      val to = new org.apache.hadoop.fs.Path(s"$out/$t.parquet")
      if (fs.exists(from)) {
        if (fs.exists(to)) fs.delete(to, true)
        org.apache.hadoop.fs.FileUtil.copy(fs, from, fs, to, false, conf)
      }
    }
    println(s"adversarial corpus written to $out")
    spark.stop()
  }
}
