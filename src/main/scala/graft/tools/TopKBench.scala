package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the native one-pass `top_k_count` aggregate against the
  * two-shuffle groupBy+ROW_NUMBER idiom it replaces, on the same join
  * input (lineitem ⋈ part brands per linestatus). Median of 3 warm
  * runs each; both plans verified to return identical rows first.
  *
  * Usage: runMain graft.tools.TopKBench [sfDir]
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val joined = graft.Tables.lineitem(spark, sfDir)
      .join(broadcast(graft.Tables.part(spark, sfDir)), $"l_partkey" === $"p_partkey")
      .select($"l_linestatus".as("g"), $"p_brand".as("v"))

    def native() = joined.groupBy($"g")
      .agg(graft.functions.TopKCount.column(spark, $"v", 5).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "s")))
      .select($"g", ($"pos" + 1).cast("long").as("rank"), $"s.value".as("v"), $"s.cnt".as("cnt"))

    def windowed() = {
      val counts = joined.groupBy($"g", $"v").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy($"g").orderBy($"cnt".desc, $"v")
      counts.withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 5)
        .select($"g", $"rank", $"v", $"cnt")
    }

    val a = native().collect().map(_.toSeq).sortBy(_.toString)
    val b = windowed().collect().map(_.toSeq).sortBy(_.toString)
    require(a.toSeq == b.toSeq, "plans disagree — abort benchmark")

    def median(run: () => Unit): Double = {
      run() // warm
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }
    val tn = median(() => native().count(): Unit)
    val tw = median(() => windowed().count(): Unit)
    println(f"""{"native_topk_sec":$tn%.3f,"window_topk_sec":$tw%.3f,"speedup":${tw / tn}%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
