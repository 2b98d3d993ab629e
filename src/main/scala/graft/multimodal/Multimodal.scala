package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus batch decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The decode kernels are STUBS (no image/audio codecs in this
  * container): each is a clearly-marked deterministic fake that consumes
  * real bytes and produces a real, schema-correct output — the Spark-side
  * plumbing (schema, batching, partitioning, output shape) is real and
  * tested. On a production cluster the stub body is replaced by the codec
  * call (JNI/ffmpeg/javax.imageio); nothing else changes.
  *
  * Scale: operators run per-partition over an iterator (the Scala analog
  * of mapInPandas batching) — no per-row task overhead, constant memory,
  * no shuffle. Binary payloads stay off the driver.
  */
object Multimodal {

  /** media asset row: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("media_type", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("mime", StringType),
      StructField("n_bytes", LongType))))))

  /** Wrap a text corpus into media rows (UTF-8 payload) — a deterministic
    * way to exercise the binary plumbing against the `documents` table.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("image").as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        col("source").as("source"),
        lit("application/octet-stream").as("mime"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB image decode: width/height/channels derived deterministically
    * from the payload bytes (a real decoder reads the header the same
    * way; same signature, same output schema).
    */
  private[multimodal] def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    // ??? real codec goes here — deterministic fake below.
    val n = content.length
    val w = 16 + (if (n > 0) (content(0) & 0x7f) else 0)
    val h = 16 + (if (n > 1) (content(1) & 0x7f) else 0)
    (w, h, 3)
  }

  /** STUB feature extraction: fixed-dim float vector folded from the
    * bytes (stands in for a CNN embedding; batch shape is the real
    * contract).
    */
  private[multimodal] def featureStub(content: Array[Byte], dim: Int): Array[Float] = {
    // ??? real model inference goes here — deterministic fake below.
    val acc = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      acc(i % dim) += (content(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Decode pass: adds (width, height, channels) per asset. Batched
    * per-partition; payload column is pruned from the output.
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val outSchema = StructType(
      media.schema.filterNot(_.name == "content") ++ Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("channels", IntegerType)))
    implicit val enc = Encoders.row(outSchema)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val (w, h, c) = decodeStub(bytes)
        val kept = r.toSeq.zipWithIndex.collect { case (v, i) if i != contentIdx => v }
        Row.fromSeq(kept ++ Seq(w, h, c))
      }
    }
  }

  /** Feature-extract pass: asset_id → float[dim] embedding, batched
    * per-partition (mini-batches of `batchSize`, mirroring accelerator
    * batching).
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
        // A real kernel would run the whole batch through the model at
        // once; the stub maps per element but preserves the batch shape.
        batch.map { r =>
          Row(r.getLong(idIdx), featureStub(r.getAs[Array[Byte]](contentIdx), dim).toSeq)
        }
      }
    }
  }

  /** STUB video frame-sampling: emit one row per sampled "frame" (every
    * `stride`-th byte stands in for a frame offset).
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
        // ??? real demux/decode goes here — stride sampling as the fake.
        Iterator.range(0, bytes.length, stride).zipWithIndex.map { case (off, fi) =>
          Row(r.getLong(idIdx), fi, bytes(off) & 0xff)
        }
      }
    }
  }
}
