package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** TEST DOUBLES for the multimodal pipeline — deterministic stand-ins
  * whose REAL counterparts live in `src/main` and drive the oracled
  * gates (`Kernels.IntMlpKernel` → mm6 inference,
  * `Multimodal.videoSamples` → mm7 demux). These exist only so specs
  * can exercise the batching/schema plumbing shape without a model or
  * codec; they are deliberately not part of the library surface.
  */
object TestDoubles {

  /** Fake feature extraction: fixed-dim float vector folded from the
    * bytes (stands in for a CNN embedding; batch shape is the real
    * contract).
    */
  def featureStub(content: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      acc(i % dim) += (content(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Feature-extract pass over a media frame: asset_id → float[dim],
    * batched per-partition (mini-batches of `batchSize`, mirroring
    * accelerator batching).
    */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("features", ArrayType(FloatType))))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          Row(r.getLong(idIdx), featureStub(r.getAs[Array[Byte]](contentIdx), dim).toSeq)
        }
      }
    }
  }

  /** Fake video frame-sampling: one row per `stride`-th byte (stands
    * in for a frame offset; the real demux is
    * `Multimodal.videoSamples`).
    */
  def sampleFrames(media: DataFrame, stride: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_byte", IntegerType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        Iterator.range(0, bytes.length, stride).zipWithIndex.map { case (off, fi) =>
          Row(r.getLong(idIdx), fi, bytes(off) & 0xff)
        }
      }
    }
  }
}
