package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints

/** Per-level timing of the LCP binary descent — attribution tool for
  * the span-removal stress row (which level class dominates, and what
  * plan shape each level join gets).
  *
  * Usage: runMain graft.tools.LcpProbe [sfDir] [printPlan=0|1]
  */
object LcpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val printPlan = args.length > 1 && args(1) == "1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stageCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val wall = (info.completionTime.getOrElse(0L) -
          info.submissionTime.getOrElse(0L)) / 1000.0
        stageCount.incrementAndGet()
        if (wall > 0.3)
          println(f"""{"slow_stage":${info.stageId},"name":"${info.name.take(60)}","tasks":${info.numTasks},"wall":$wall%.1f,"cpu_ms":${info.taskMetrics.executorCpuTime / 1000000},"run_ms":${info.taskMetrics.executorRunTime}}""")
      }
    })

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).cache()
    docs.count()

    val t0 = System.nanoTime()
    val ix = graft.text.SuffixArray.buildIndex(docs, "doc_id", "text",
      retainLevels = true)
    println(f"""{"stage":"build","sec":${(System.nanoTime() - t0) / 1e9}%.1f,"levels":${ix.levels.length},"total":${ix.total}}""")

    val pairs0 = ix.full.select(col("rank").as("sa_rank"), col("gid").as("gid1"))
      .join(ix.full.select((col("rank") - 1L).as("sa_rank"), col("gid").as("gid2")),
        Seq("sa_rank"))
      .withColumn("lcp", lit(0L))
    val desc = ix.levels.sortBy(-_._1).drop(1)
    var (p, tok) = Checkpoints.eager(pairs0)
    for ((m, lvl) <- desc) {
      val tp = System.nanoTime()
      val nparts = lvl.rdd.getNumPartitions
      val cnt = lvl.count()
      println(f"""{"stage":"lvl_scan","m":$m,"parts":$nparts,"rows":$cnt,"sec":${(System.nanoTime() - tp) / 1e9}%.1f}""")
      val tl = System.nanoTime()
      val a = lvl.select(col("gid").as("__ga"), col("rank").as("__ra"))
      val b = lvl.select(col("gid").as("__gb"), col("rank").as("__rb"))
      val nx = p
        .join(a, col("__ga") === col("gid1") + col("lcp"), "left_outer")
        .join(b, col("__gb") === col("gid2") + col("lcp"), "left_outer")
        .withColumn("lcp", col("lcp") +
          when(coalesce(col("__ra"), lit(-1L)) === coalesce(col("__rb"), lit(-2L)),
            lit(m)).otherwise(lit(0L)))
        .select(col("sa_rank"), col("gid1"), col("gid2"), col("lcp"))
      if (printPlan && m == desc.head._1) {
        nx.collect()
        println(nx.queryExecution.executedPlan.toString().linesIterator
          .take(40).mkString("\n"))
      }
      val (ck, t2) = Checkpoints.eager(nx)
      tok.free()
      p = ck
      tok = t2
      println(f"""{"stage":"level","m":$m,"sec":${(System.nanoTime() - tl) / 1e9}%.1f,"stages":${stageCount.getAndSet(0)}}""")
    }
    spark.stop()
  }
}
