package graft.pos

import graft.SparkSpec
import graft.multimodal.ImageCodec

/** K10 chart sink: rasters verified structurally via our own decoder
  * (ImageIO cross-checks the PNG envelope elsewhere).
  */
class ChartsSpec extends SparkSpec {

  private def raster(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    val Some((h, px)) = ImageCodec.decodePng(png)
    (h.width, h.height, px)
  }

  test("barChart: bar heights proportional to values; axes drawn") {
    val (w, h, px) = raster(Charts.barChart(Seq("a" -> 10.0, "b" -> 5.0, "c" -> 0.0), 60, 50))
    assert(w === 60 && h === 50)
    def columnBlackCount(x: Int): Int =
      (0 until h - 1).count(y => (px(y * w + x) & 0xff) == 0)
    // sample the middle of each bar band
    val band = (w - 2) / 3
    val ha = columnBlackCount(1 + band / 2)
    val hb = columnBlackCount(1 + band + band / 2)
    val hc = columnBlackCount(1 + 2 * band + band / 2)
    assert(ha === 48, "max bar fills the plot height")
    assert(math.abs(hb - 24) <= 1, s"half bar ~24, got $hb")
    assert(hc === 0, "zero bar draws nothing")
    assert((0 until h).forall(y => (px(y * w) & 0xff) == 128), "y axis")
    assert((0 until w).forall(x => (px((h - 1) * w + x) & 0xff) == 128), "x axis")
  }

  test("lineChart: endpoints hit min/max rows; ImageIO reads the file") {
    val png = Charts.lineChart(Seq(0.0, 10.0, 5.0), 61, 41)
    val (w, h, px) = raster(png)
    def isBlack(x: Int, y: Int) = (px(y * w + x) & 0xff) == 0
    assert(isBlack(1, h - 2), "first point at min → bottom-left")
    assert((0 until w).exists(x => isBlack(x, 1)), "max point reaches top row")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 61 && img.getHeight === 41)
  }

  test("writeMonthlyCharts: renders decodable PNGs from the lake") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("charts").toString
    val rows = Seq(
      ("r1", java.sql.Timestamp.valueOf("2025-07-01 10:00:00"), "Burger", 100.0),
      ("r2", java.sql.Timestamp.valueOf("2025-07-02 11:00:00"), "Fries", 50.0),
      ("r3", java.sql.Timestamp.valueOf("2025-07-02 12:00:00"), "Burger", 80.0)
    ).toDF("receipt_number", "shifted_time", "item_name", "price")
      .withColumn("total_money", $"price")
      .withColumn("modifiers", lit(null: String))
      .withColumn("datetime", $"shifted_time")
      .withColumn("date", lit("x")).withColumn("time", lit("x"))
      .withColumn("order_type", lit("Mesa"))
      .withColumn("cost", lit(1.0))
      .withColumn("payment_type", lit("CASH"))
      .withColumn("minutes_past_midnight", lit(0L))
      .withColumn("time_slot", lit("00:00-01:00"))
    Lake.writeFull(rows, s"$dir/lake")
    val files = Charts.writeMonthlyCharts(spark, s"$dir/lake", "2025-07", s"$dir/charts")
    assert(files.length === 2)
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
      assert(ImageCodec.decodePng(bytes).isDefined, s"$f not a decodable PNG")
    }
  }
}
