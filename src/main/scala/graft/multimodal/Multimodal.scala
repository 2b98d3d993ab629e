package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus batch decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The image path is REAL: payloads are genuine PNG files and the decode
  * operators parse them with [[ImageCodec]] (magic-byte sniff, IHDR/SOF
  * header parse, full inflate + unfilter raster decode) — no stubs. The
  * model-inference feature kernel and the video demux remain documented
  * deterministic stands-in (no accelerator / media demuxer in scope);
  * their Spark-side batching contract is the real part.
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

  /** Deterministic image geometry for the synthetic corpus: every
    * derived quantity is a pure function of doc_id, so a SQL oracle can
    * predict headers and pixel statistics without decoding anything.
    */
  private[multimodal] def imgWidth(docId: Long): Int = (8 + docId % 24).toInt
  private[multimodal] def imgHeight(docId: Long): Int = (8 + (docId * 3) % 24).toInt
  private[multimodal] def imgPixel(docId: Long)(x: Int, y: Int): Int =
    ((x + y + docId) % 256).toInt

  /** Wrap a document corpus into media rows whose payloads are REAL
    * encoded PNGs (8-bit grayscale, dimensions and gradient raster
    * derived from doc_id). Encoding runs per-partition on executors;
    * the driver never sees a payload.
    */
  def fromDocuments(docs: DataFrame): DataFrame = {
    implicit val enc = Encoders.row(mediaSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val srcIdx = docs.schema.fieldIndex("source")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val png = ImageCodec.encodeGrayPng(imgWidth(id), imgHeight(id), imgPixel(id))
        Row(id, "image", png, Row(r.getString(srcIdx), "image/png", png.length.toLong))
      }
    }
  }

  /** Deterministic JPEG geometry: multiple-of-8 dims (the DC-only
    * baseline profile quantizes whole 8×8 blocks) and a per-block
    * constant raster, all closed-form in doc_id for the oracle.
    */
  private[multimodal] def jpegWidth(docId: Long): Int = (8 * (1 + docId % 3)).toInt
  private[multimodal] def jpegHeight(docId: Long): Int = (8 * (1 + (docId * 2) % 3)).toInt
  private[multimodal] def jpegBlockVal(docId: Long)(bx: Int, by: Int): Int =
    ((17L * bx + 31L * by + docId) % 256).toInt

  /** Wrap a document corpus into media rows whose payloads are REAL
    * baseline JPEGs (grayscale, DC-only blocks — see
    * [[ImageCodec.encodeGrayJpegDc]]), the second codec the resize pass
    * exercises.
    */
  def fromDocumentsJpeg(docs: DataFrame): DataFrame = {
    implicit val enc = Encoders.row(mediaSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val srcIdx = docs.schema.fieldIndex("source")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val jpg = ImageCodec.encodeGrayJpegDc(jpegWidth(id), jpegHeight(id), jpegBlockVal(id))
        Row(id, "image", jpg, Row(r.getString(srcIdx), "image/jpeg", jpg.length.toLong))
      }
    }
  }

  /** Deterministic audio/video geometry, same idea as the PNG path:
    * every header field the decoders recover is a pure function of
    * doc_id, so SQL oracles verify the parse without touching bytes.
    */
  private[multimodal] def wavChannels(docId: Long): Int = (1 + docId % 2).toInt
  private[multimodal] def wavSamples(docId: Long): Int = (500 + docId % 250).toInt
  private[multimodal] def mp4Duration(docId: Long): Long = 60 + docId % 3000
  private[multimodal] def mp4FreePad(docId: Long): Int = (docId % 32).toInt
  private[multimodal] def mp4SampleCount(docId: Long): Int = (5 + docId % 12).toInt
  private[multimodal] def mp4SampleDelta(docId: Long): Long = 100 + docId % 24
  private[multimodal] def mp4SampleSize(docId: Long)(i: Int): Int =
    (100 + (docId + 7L * i) % 50).toInt
  private[multimodal] val mp4SamplesPerChunk = 2

  /** Document corpus → real PCM WAV payloads (8 kHz, 16-bit). */
  def fromDocumentsWav(docs: DataFrame): DataFrame = {
    implicit val enc = Encoders.row(mediaSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val srcIdx = docs.schema.fieldIndex("source")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val wav = MediaCodec.encodeWavPcm(
          8000, wavChannels(id), 16, wavSamples(id),
          i => ((i * 7 + id) % 65536).toInt - 32768)
        Row(id, "audio", wav, Row(r.getString(srcIdx), "audio/wav", wav.length.toLong))
      }
    }
  }

  /** Document corpus → real MP4 payloads with a full sample table
    * (ftyp + free + moov{mvhd, trak/mdia/minf/stbl}; the variable-size
    * free box forces a genuine box walk, and the stts/stsc/stsz/stco
    * tables make the payload demuxable — [[videoSamples]] consumes
    * them). All geometry is closed-form in doc_id for the oracles.
    */
  def fromDocumentsMp4(docs: DataFrame): DataFrame = {
    implicit val enc = Encoders.row(mediaSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val srcIdx = docs.schema.fieldIndex("source")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val mp4 = MediaCodec.encodeMp4Track(
          600, mp4Duration(id), mp4FreePad(id),
          (0 until mp4SampleCount(id)).map(mp4SampleSize(id)),
          mp4SamplesPerChunk, mp4SampleDelta(id))
        Row(id, "video", mp4, Row(r.getString(srcIdx), "video/mp4", mp4.length.toLong))
      }
    }
  }

  /** Audio decode pass: RIFF walk → PCM format + exact duration. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_samples", LongType),
      StructField("duration_us", LongType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaCodec.decodeWav(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(h) =>
            Row(r.getLong(idIdx), h.sampleRate, h.channels, h.bitsPerSample,
              h.nSamples, h.nSamples * 1000000L / h.sampleRate)
          case None => Row(r.getLong(idIdx), -1, -1, -1, -1L, -1L)
        }
      }
    }
  }

  /** PCM sample statistics: decode the full interleaved sample stream
    * (16-bit LE via [[MediaCodec.decodeWavSamples]]) and reduce to
    * exact integer stats — the audio twin of [[pixelStats]], verifying
    * the byte-level PCM round trip, not just headers.
    */
  def audioStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("n_values", LongType),
      StructField("sample_sum", LongType),
      StructField("sample_min", IntegerType),
      StructField("sample_max", IntegerType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaCodec.decodeWavSamples(r.getAs[Array[Byte]](contentIdx)) match {
          case Some((_, samples)) =>
            var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
            var i = 0
            while (i < samples.length) {
              val v = samples(i)
              sum += v; if (v < mn) mn = v; if (v > mx) mx = v
              i += 1
            }
            Row(r.getLong(idIdx), samples.length.toLong, sum, mn, mx)
          case None => Row(r.getLong(idIdx), -1L, -1L, -1, -1)
        }
      }
    }
  }

  /** Energy-band AUDIO fingerprint — [[imageAHash]]'s twin over the
    * decoded PCM stream: 64 equal windows over the interleaved sample
    * values (value index i → window i·64 div n, the same closed-form
    * map), each bit comparing window |amplitude| sum against the track
    * mean by integer cross-multiplication. Runs through the REAL WAV
    * decode (RIFF walk + 16-bit LE PCM); the hash — never the PCM —
    * is the downstream dedup key. Sentinel -1 rows for undecodable
    * payloads.
    */
  def audioAHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("n_values", LongType),
      StructField("hash_hi", LongType),
      StructField("hash_lo", LongType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaCodec.decodeWavSamples(r.getAs[Array[Byte]](contentIdx)) match {
          case Some((_, samples)) =>
            val n = samples.length
            val ws = new Array[Long](64)
            val wc = new Array[Long](64)
            var total = 0L
            var i = 0
            while (i < n) {
              val w = (i.toLong * 64 / n).toInt
              val v = math.abs(samples(i)).toLong
              ws(w) += v; wc(w) += 1; total += v
              i += 1
            }
            var lo = 0L; var hi = 0L
            var b = 0
            while (b < 64) {
              if (ws(b) * n > total * wc(b)) {
                if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
              }
              b += 1
            }
            Row(r.getLong(idIdx), n.toLong, hi, lo)
          case None => Row(r.getLong(idIdx), -1L, -1L, -1L)
        }
      }
    }
  }

  /** Video container decode pass: ISO-BMFF box walk → movie header. */
  def decodeVideo(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("timescale", LongType),
      StructField("duration_ticks", LongType),
      StructField("n_bytes", LongType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        MediaCodec.decodeMp4(bytes) match {
          case Some(h) => Row(r.getLong(idIdx), h.timescale, h.durationTicks, bytes.length.toLong)
          case None => Row(r.getLong(idIdx), -1L, -1L, bytes.length.toLong)
        }
      }
    }
  }

  /** Text-payload variant (UTF-8 bytes labeled as opaque media) — feeds
    * the stub kernels' batching specs and the frame-sampling stand-in.
    */
  def fromText(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("image").as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        col("source").as("source"),
        lit("application/octet-stream").as("mime"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** Decode pass: parses each payload's real header (PNG IHDR or JPEG
    * SOF via [[ImageCodec.decodeHeader]]) and adds (width, height,
    * channels); undecodable payloads yield -1s rather than failing the
    * batch. Batched per-partition; the payload column is pruned from the
    * output.
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
        val h = ImageCodec.decodeHeader(bytes)
        val (w, ht, c) = h.map(x => (x.width, x.height, x.channels)).getOrElse((-1, -1, -1))
        val kept = r.toSeq.zipWithIndex.collect { case (v, i) if i != contentIdx => v }
        Row.fromSeq(kept ++ Seq(w, ht, c))
      }
    }
  }

  /** Full-raster feature pass: inflate + unfilter each PNG and compute
    * exact integer pixel statistics (the "real decode" half of feature
    * extraction — what a preprocessing pipeline runs before normalize /
    * model input). Exact integers ⇒ SQL-oracle-checkable end-to-end
    * through compression.
    */
  def pixelStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_sum", LongType),
      StructField("pixel_max", IntegerType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        ImageCodec.decodePng(bytes) match {
          case Some((h, px)) =>
            var sum = 0L; var max = 0
            var i = 0
            while (i < px.length) {
              val v = px(i) & 0xff
              sum += v; if (v > max) max = v
              i += 1
            }
            Row(r.getLong(idIdx), h.width, h.height, sum, max)
          case None =>
            Row(r.getLong(idIdx), -1, -1, -1L, -1)
        }
      }
    }
  }

  /** Perceptual AVERAGE-HASH per image — the content fingerprint image
    * dedup pipelines bucket on (aHash: 8×8 grid of cell-mean vs
    * image-mean bits). Exact integer end-to-end so the oracle can
    * replay it: a pixel at (x, y) belongs to grid cell
    * (x·8 div w, y·8 div h) — the SAME closed-form map both engines
    * evaluate — and each bit compares cellSum · nPixels >
    * totalSum · cellCount (cross-multiplication; no float mean ever
    * materializes). The 64 bits pack row-major into two non-negative
    * 32-bit halves (hash_hi = bits 32..63, hash_lo = bits 0..31) so no
    * sign wrap can diverge between engines. Runs through the REAL PNG
    * decode (inflate + unfilter), batched per partition; undecodable
    * payloads yield sentinel -1 rows.
    *
    * Scale shape: a narrow per-asset map — the hash is the SHUFFLE KEY
    * for downstream dedup, never the raster; banded Hamming pairing
    * (the m4/m6 SimHash discipline) applies unchanged when near-dup
    * pairs are wanted.
    */
  def imageAHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("hash_hi", LongType),
      StructField("hash_lo", LongType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        ImageCodec.decodePng(bytes) match {
          case Some((h, px)) =>
            val w = h.width; val ht = h.height
            val cs = new Array[Long](64)
            val cn = new Array[Long](64)
            var total = 0L
            var y = 0
            while (y < ht) {
              val cj = y * 8 / ht
              var x = 0
              while (x < w) {
                val b = cj * 8 + (x * 8 / w)
                val v = (px(y * w + x) & 0xff).toLong
                cs(b) += v; cn(b) += 1; total += v
                x += 1
              }
              y += 1
            }
            val npx = w.toLong * ht
            var lo = 0L; var hi = 0L
            var b = 0
            while (b < 64) {
              if (cs(b) * npx > total * cn(b)) {
                if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
              }
              b += 1
            }
            Row(r.getLong(idIdx), w, ht, hi, lo)
          case None =>
            Row(r.getLong(idIdx), -1, -1, -1L, -1L)
        }
      }
    }
  }

  /** Resize pass: nearest-neighbor downsample of each decoded raster to
    * a fixed (targetW × targetH) thumbnail — the standard pre-model
    * normalization step (every vision pipeline resizes before batching).
    * Source pixel for target (tx, ty) is (tx·w div targetW,
    * ty·h div targetH) — pure integer arithmetic, so the positional
    * checksum Σ (ty·targetW+tx+1)·pixel pins EVERY output pixel's value
    * and position for the SQL oracle, through the full
    * decode→inflate→unfilter→resample path. Dispatches on the payload's
    * magic bytes: PNG → full inflate+unfilter decode, JPEG → the DC-only
    * baseline decode ([[ImageCodec.decodeJpegGrayDc]]). Batched
    * per-partition like the other kernels; undecodable or out-of-profile
    * payloads yield sentinel -1 rows (the documented contract — a
    * general-IDCT JPEG is sentinel'd, not mis-decoded).
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("out_w", IntegerType),
      StructField("out_h", IntegerType),
      StructField("out_sum", LongType),
      StructField("out_pos_sum", LongType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val decoded = ImageCodec.sniff(bytes) match {
          case "png" => ImageCodec.decodePng(bytes)
          case "jpeg" => ImageCodec.decodeJpegGrayDc(bytes)
          case _ => None
        }
        decoded match {
          case Some((h, px)) =>
            var sum = 0L; var posSum = 0L
            var ty = 0
            while (ty < targetH) {
              val sy = ty * h.height / targetH
              var tx = 0
              while (tx < targetW) {
                val sx = tx * h.width / targetW
                val v = px(sy * h.width + sx) & 0xff
                sum += v
                posSum += (ty.toLong * targetW + tx + 1) * v
                tx += 1
              }
              ty += 1
            }
            Row(r.getLong(idIdx), h.width, h.height, targetW, targetH, sum, posSum)
          case None =>
            Row(r.getLong(idIdx), -1, -1, targetW, targetH, -1L, -1L)
        }
      }
    }
  }

  /** Deterministic MJPEG frame geometry: per (doc, frame) dims and the
    * per-block constant raster, all closed-form for the mm7b oracle.
    * Frame count / chunking / timing reuse the mp4* closed forms so
    * the two video corpora stay structurally comparable.
    */
  private[multimodal] def mjpegFrameW(docId: Long, i: Int): Int =
    (8 * (1 + (docId + i) % 3)).toInt
  private[multimodal] def mjpegFrameH(docId: Long, i: Int): Int =
    (8 * (1 + (2 * docId + i) % 3)).toInt
  private[multimodal] def mjpegBlockVal(docId: Long, i: Int)(bx: Int, by: Int): Int =
    ((17L * bx + 31L * by + docId + 5L * i) % 256).toInt

  /** Document corpus → MP4s that CARRY their media: every sample is a
    * real DC-baseline JPEG frame laid out in the mdat box
    * ([[MediaCodec.encodeMp4Mjpeg]]), so the demux's (offset, size)
    * rows point at decodable payload bytes — the last modality that
    * previously parsed container tables without touching payload.
    */
  def fromDocumentsMjpeg(docs: DataFrame): DataFrame = {
    implicit val enc = Encoders.row(mediaSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val srcIdx = docs.schema.fieldIndex("source")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val frames = (0 until mp4SampleCount(id)).map { i =>
          ImageCodec.encodeGrayJpegDc(
            mjpegFrameW(id, i), mjpegFrameH(id, i), mjpegBlockVal(id, i))
        }
        val mp4 = MediaCodec.encodeMp4Mjpeg(
          600, mp4Duration(id), mp4FreePad(id), frames,
          mp4SamplesPerChunk, mp4SampleDelta(id))
        Row(id, "video", mp4, Row(r.getString(srcIdx), "video/mp4", mp4.length.toLong))
      }
    }
  }

  /** Video FRAME DECODE pass — demux + payload decode in one
    * per-partition sweep: walk the sample table, byte-slice each
    * sample out of the container, decode it as a baseline JPEG and
    * reduce to exact integer pixel stats. One output row per frame;
    * a sample whose bytes fall outside the file or fail the decoder
    * yields a sentinel row (width −1) so corruption is visible in the
    * relation instead of silently dropped. No shuffle; payloads never
    * leave the executor.
    */
  def videoFrameStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("sample_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_sum", LongType),
      StructField("pixel_min", IntegerType),
      StructField("pixel_max", IntegerType),
      StructField("dts_ticks", LongType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](contentIdx)
        def sentinel(idx: Int) = Row(id, idx, -1, -1, -1L, -1, -1, -1L)
        MediaCodec.decodeMp4Samples(bytes) match {
          case Some(samples) =>
            samples.iterator.map { s =>
              val lo = s.offset
              val hi = s.offset + s.size
              if (lo < 0 || hi > bytes.length || s.size <= 0) sentinel(s.idx)
              else {
                val frame = java.util.Arrays.copyOfRange(bytes, lo.toInt, hi.toInt)
                ImageCodec.decodeJpegGrayDc(frame) match {
                  case Some((h, px)) =>
                    var sum = 0L; var mn = 255; var mx = 0
                    var i = 0
                    while (i < px.length) {
                      val v = px(i) & 0xff
                      sum += v
                      if (v < mn) mn = v
                      if (v > mx) mx = v
                      i += 1
                    }
                    Row(id, s.idx, h.width, h.height, sum, mn, mx, s.dts)
                  case None => sentinel(s.idx)
                }
              }
            }
          case None => Iterator.single(sentinel(-1))
        }
      }
    }
  }

  /** Video demux pass: walk moov → trak → mdia → minf → stbl and join
    * the stts/stsc/stsz/stco sample tables into one row per media
    * sample — size, owning chunk, exact byte offset, decoding
    * timestamp. This replaces the round-2 stride-sampling stand-in with
    * the real ISO-BMFF demux structure (no codec needed: sample
    * positions are container metadata). Undecodable payloads yield a
    * single sentinel row.
    */
  def videoSamples(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("sample_idx", IntegerType),
      StructField("sample_bytes", LongType),
      StructField("chunk_idx", IntegerType),
      StructField("file_offset", LongType),
      StructField("dts_ticks", LongType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        MediaCodec.decodeMp4Samples(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(samples) =>
            samples.iterator.map(s => Row(id, s.idx, s.size, s.chunk, s.offset, s.dts))
          case None => Iterator.single(Row(id, -1, -1L, -1, -1L, -1L))
        }
      }
    }
  }

  /** Model-inference pass over an [[InferenceKernel]]: one kernel call
    * per mini-batch (the accelerator round-trip shape), one output row
    * per (asset, logit index). Undecodable payloads yield a single
    * sentinel row (out_idx −1) instead of killing the batch. With
    * [[IntMlpKernel]] this is a REAL forward pass — decode → fold →
    * dense → ReLU → dense — whose integer logits the mm6 oracle
    * hash-verifies end to end.
    */
  def inferLogits(media: DataFrame, kernel: InferenceKernel, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("out_idx", IntegerType),
      StructField("logit", LongType)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("asset_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val ids = batch.map(_.getLong(idIdx))
        val out = kernel.infer(batch.map(_.getAs[Array[Byte]](contentIdx)).toIndexedSeq)
        ids.iterator.zip(out.iterator).flatMap {
          case (id, Some(logits)) =>
            logits.iterator.zipWithIndex.map { case (v, o) => Row(id, o, v) }
          case (id, None) => Iterator.single(Row(id, -1, -1L))
        }
      }
    }
  }
}
