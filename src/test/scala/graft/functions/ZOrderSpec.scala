package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order contracts: the interleave matches a bit-level reference, the
  * dialect SQL generators agree with the Column form, and the layout
  * actually pays off — a 2-D box predicate translated to z-band ranges
  * prunes partition directories a single-column sort could not.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the bit-interleave reference on random points") {
    val pts = Seq.tabulate(200)(i => ((i * 37L) % 1024, (i * 101L) % 1024))
    val out = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue($"x", $"y", 10).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) => assert(z == zRef(x, y, 10), s"($x,$y)") }
  }

  test("Spark-dialect SQL generator agrees with the Column form") {
    val out = Seq((837L, 412L)).toDF("x", "y")
      .select(
        ZOrder.zValue($"x", $"y", 10).as("zc"),
        expr(ZOrder.zValueSqlSpark("x", "y", 10)).as("zs"))
      .as[(Long, Long)].head()
    assert(out._1 == out._2)
  }

  test("z-band layout: a quadrant box prunes to 1 of 16 partition dirs") {
    // 32×32 grid, 5 bits/dim, bands = z >> 6 (16 dirs of 64 cells).
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val grid = spark.range(1024).select(
      (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
    grid
      .withColumn("z_band", shiftright(ZOrder.zValue(col("x"), col("y"), 5), 6))
      .write.mode("overwrite").partitionBy("z_band").parquet(dir)
    val t = spark.read.parquet(dir)
    val box = col("x") < 8 && col("y") < 8
    // The z-order query pattern: enumerate the bands the box intersects
    // (cheap — band space is small) and push them as a partition filter.
    val bands = (for { x <- 0 until 8; y <- 0 until 8 }
      yield zRef(x, y, 5) >> 6).distinct.sorted
    assert(bands == Seq(0L)) // quadrant alignment → exactly one band
    val pruned = t.filter(col("z_band").isin(bands: _*) && box)
    val full = t.filter(box)
    // Same answer with and without the band predicate…
    assert(pruned.count() == 64 && full.count() == 64)
    // …and the band predicate reaches the scan as a partition filter
    // (directory-level pruning — the thing a single-column sort cannot
    // give a 2-D box).
    val plan = pruned.queryExecution.sparkPlan.toString
    assert(
      raw"PartitionFilters: \[[^\]]*z_band".r.findFirstIn(plan).isDefined,
      s"no z_band partition filter in plan:\n$plan")
  }
}
