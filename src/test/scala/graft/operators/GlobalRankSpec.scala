package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the two-pass global rank ≡ the single-window `row_number` it
  * replaces — including with duplicate order keys (total order via the
  * id tie-break), skewed keys, and more partitions than rows.
  */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("two-pass rank equals the single-window row_number") {
    // Skewed duplicate keys: "a" dominates, ties broken by id.
    val df = (1L to 500L).map(i => (i, if (i % 7 == 0) s"k$i" else "a"))
      .toDF("id", "key")
    val want = df
      .withColumn("rk", row_number().over(
        Window.orderBy(col("key"), col("id"))).cast("long"))
      .orderBy(col("id")).as[(Long, String, Long)].collect().toSeq
    val got = GlobalRank
      .withGlobalRank(df, "rk", nParts = 13, col("key"), col("id"))
      .select(col("id"), col("key"), col("rk"))
      .orderBy(col("id")).as[(Long, String, Long)].collect().toSeq
    assert(got == want)
  }

  test("more partitions than rows (empty ranges) still ranks densely") {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("id", "key")
    val got = GlobalRank
      .withGlobalRank(df, "rk", nParts = 16, col("key"), col("id"))
      .select(col("id"), col("rk")).orderBy(col("id"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }
}
