package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Nearest-neighbor resize contract: the Spark kernel's checksums match
  * an independent reference resample (via javax.imageio decode) and
  * corrupt payloads yield sentinels instead of killing the task.
  */
class ResizeSpec extends SparkSpec {
  import spark.implicits._

  test("resizeImages matches an ImageIO-based reference resample") {
    val docs = Seq((3L, "s"), (10L, "s"), (25L, "s")).toDF("doc_id", "source")
    val out = Multimodal
      .resizeImages(Multimodal.fromDocuments(docs), 8, 8)
      .orderBy("asset_id")
      .as[(Long, Int, Int, Int, Int, Long, Long)].collect()
    out.foreach { case (id, w, h, ow, oh, sum, posSum) =>
      val png = ImageCodec.encodeGrayPng(
        Multimodal.imgWidth(id), Multimodal.imgHeight(id), Multimodal.imgPixel(id))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      var refSum = 0L; var refPos = 0L
      for (ty <- 0 until 8; tx <- 0 until 8) {
        val v = img.getRaster.getSample(tx * w / 8, ty * h / 8, 0)
        refSum += v
        refPos += (ty * 8 + tx + 1).toLong * v
      }
      assert((ow, oh) == (8, 8))
      assert(sum == refSum && posSum == refPos, s"asset $id")
    }
  }

  test("undecodable payload yields a sentinel row, not a task failure") {
    val junk = Seq((7L, "image", Array[Byte](1, 2, 3),
      ("src", "image/png", 3L)))
      .toDF("asset_id", "media_type", "content", "meta")
    val out = Multimodal.resizeImages(junk, 8, 8)
      .select("asset_id", "width", "out_sum").as[(Long, Int, Long)].head()
    assert(out == ((7L, -1, -1L)))
  }
}
