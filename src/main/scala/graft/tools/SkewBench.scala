package graft.tools

import graft.operators.SkewJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Head-to-head: explicit salting (SkewJoin.saltedJoin) vs AQE's
  * runtime skew-join vs a plain sort-merge join, on a deliberately
  * hot-keyed fact join. 60% of lineitem rows collapse onto one key;
  * the rest spread over 100k keys — the single-hot-key regime where
  * AQE's partition splitting must subdivide one key's partition and
  * salting pre-spreads it. Broadcast is disabled for all variants so
  * the comparison isolates the shuffle-join strategies.
  *
  * Prints one JSON line with the second-pass (warm) times.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "true")
      // Let AQE consider our (small-by-cluster-standards) partitions
      // skewed: default thresholds target multi-GB shuffles.
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val big = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        when($"l_orderkey" % 10 < 6, 0L)
          .otherwise(pmod($"l_orderkey", lit(100000)).cast("long")).as("key"),
        $"l_orderkey", $"l_extendedprice")
    val small = spark.range(100000).select($"id".as("key"), ($"id" * 7).as("dim_payload"))

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def salted: Long =
      SkewJoin.saltedJoin(big, small, "key", Seq("l_orderkey"), 32).count()
    def plain(skewJoin: Boolean): Long = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      big.join(small, "key").count()
    }
    // Pass 1 warms JIT/codegen/IO; pass 2 is reported.
    Seq(1, 2).foreach { pass =>
      val tSalt = time(salted)
      val tAqe = time(plain(skewJoin = true))
      val tNone = time(plain(skewJoin = false))
      if (pass == 2)
        println(s"""{"bench":"skew","sf":"$sfDir","salted_sec":$tSalt,"aqe_skew_sec":$tAqe,"plain_sec":$tNone}""")
    }
    spark.stop()
  }
}
