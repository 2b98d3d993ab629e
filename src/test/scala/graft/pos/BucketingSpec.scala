package graft.pos

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located bucketed join: same-key same-bucket-count tables join
  * without a shuffle exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed lineitem⋈orders joins with no shuffle exchange; plain join shuffles") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    // Hermetic: drop catalog entries AND any orphaned warehouse dirs
    // (a deleted metastore with a surviving location breaks overwrite).
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(li, "li_bucketed", Seq("l_orderkey"), 8)
    Bucketing.writeBucketed(o, "o_bucketed", Seq("o_orderkey"), 8)

    def agg(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      l.join(r, l("l_orderkey") === r("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

    val bucketed = agg(
      Bucketing.table(spark, "li_bucketed"), Bucketing.table(spark, "o_bucketed"))
    // The join itself is exchange-free (only the final small agg may
    // exchange on the group key) — check the join inputs specifically.
    val joined = Bucketing.table(spark, "li_bucketed")
      .join(Bucketing.table(spark, "o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("o_orderpriority"))
    assert(Bucketing.isShuffleFree(joined))

    // Same join over raw parquet DOES shuffle (negative control), unless
    // one side is small enough to broadcast — disable that for the check.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderpriority"))
      assert(!Bucketing.isShuffleFree(plain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")

    // And the results agree with the plain join
    val expected = agg(li, o).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = bucketed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }
}
