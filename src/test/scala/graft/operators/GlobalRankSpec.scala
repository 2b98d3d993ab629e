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

  test("two-pass ntile equals the single-window NTILE, remainder and tiny totals included") {
    // 100 % 3 = 1 (one wide bucket), 99 % 9 = 0, 5 < 7 (fewer rows
    // than buckets), 100 % 7 = 2 — every NTILE remainder class.
    for ((rows, n) <- Seq((100, 3), (99, 9), (5, 7), (100, 7))) {
      val df = (1 to rows).map(i => (i.toLong, (i * 37 % rows).toLong))
        .toDF("id", "key")
      val want = df
        .withColumn("b", ntile(n).over(
          Window.orderBy(col("key"), col("id"))).cast("long"))
        .orderBy(col("id")).select(col("id"), col("b"))
        .as[(Long, Long)].collect().toSeq
      val got = GlobalRank
        .withGlobalNtile(df, "b", n, nParts = 13, col("key"), col("id"))
        .orderBy(col("id")).select(col("id"), col("b"))
        .as[(Long, Long)].collect().toSeq
      assert(got == want, s"ntile($n) over $rows rows")
    }
  }

  test("two-pass prefix sum equals the single-window running sum under skewed duplicates") {
    val df = (1L to 500L)
      .map(i => (i, if (i % 7 == 0) s"k$i" else "a", i % 13 + 1))
      .toDF("id", "key", "v")
    val want = df
      .withColumn("cum", sum(col("v")).over(
        Window.orderBy(col("key").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("id")).select(col("id"), col("cum"))
      .as[(Long, Long)].collect().toSeq
    val got = GlobalRank
      .withGlobalPrefixSum(df, "cum", col("v"), nParts = 13,
        col("key").desc, col("id"))
      .orderBy(col("id")).select(col("id"), col("cum"))
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
  }
}
