package graft.tools

import graft.pos.Analytics
import graft.queries.PosQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Window-vs-aggregate dedup comparison on the posified view: the
  * ROW_NUMBER window (ships + sorts every row) against
  * max_by (map-side combinable hash aggregate). Asserts both forms
  * produce identical winners before timing.
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pos = PosQueries.posify(spark, sfDir).cache()
    pos.count()
    val tie = Seq(col("price").desc, coalesce(col("modifiers"), lit("")).desc)
    val tieAgg = Seq(col("price"), coalesce(col("modifiers"), lit("")))
    def windowForm: Long = Analytics.dedupLatest(pos, tie).count()
    def aggForm: Long = Analytics.dedupLatestAgg(pos, tieAgg).count()
    // winners identical (total order on this corpus)
    val w = Analytics.dedupLatest(pos, tie)
      .select("receipt_number", "item_name", "price", "shifted_time")
    val a = Analytics.dedupLatestAgg(pos, tieAgg)
      .select("receipt_number", "item_name", "price", "shifted_time")
    val diff = w.exceptAll(a).count() + a.exceptAll(w).count()
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    windowForm; aggForm // warm
    val tw = time(windowForm); val ta = time(aggForm)
    println(s"""{"bench":"dedup","sf":"$sfDir","window_sec":$tw,"agg_sec":$ta,"winner_diff":$diff}""")
    spark.stop()
  }
}
