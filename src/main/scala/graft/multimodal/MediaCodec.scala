package graft.multimodal

/** Pure-JVM audio/video container parsing for the multimodal operators:
  * WAV (RIFF chunk walk → PCM format + duration) and MP4 (ISO base
  * media box walk → movie header timescale/duration). Both are public
  * specifications (RIFF/WAVE: Microsoft/IBM 1991 multimedia standard;
  * MP4: ISO/IEC 14496-12). Together with [[ImageCodec]] this makes all
  * three modality decoders real header parsers; only model-level
  * kernels (CNN features, audio transcription, video frame decode)
  * remain documented stubs.
  */
object MediaCodec {

  final case class WavHeader(
      sampleRate: Int, channels: Int, bitsPerSample: Int, nSamples: Long)

  final case class Mp4Header(timescale: Long, durationTicks: Long)

  /** One demuxed media sample (ISO/IEC 14496-12 §8.5–8.7 sample
    * tables): byte size and position plus decoding timestamp in
    * media-timescale ticks.
    */
  final case class Mp4Sample(idx: Int, size: Long, chunk: Int, offset: Long, dts: Long)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Encode canonical PCM WAV: 12-byte RIFF header, 24-byte fmt chunk,
    * data chunk — total 44 + nSamples·channels·(bits/8) bytes.
    */
  def encodeWavPcm(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      nSamples: Int,
      sample: Int => Int): Array[Byte] = {
    val bytesPerSample = bitsPerSample / 8
    val dataLen = nSamples * channels * bytesPerSample
    val out = new Array[Byte](44 + dataLen)
    def putTag(off: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, off, 4)
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >>> 8) & 0xff).toByte
      out(off + 2) = ((v >>> 16) & 0xff).toByte; out(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >>> 8) & 0xff).toByte
    }
    putTag(0, "RIFF"); put32(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, channels); put32(24, sampleRate)
    put32(28, sampleRate * channels * bytesPerSample) // byte rate
    put16(32, channels * bytesPerSample) // block align
    put16(34, bitsPerSample)
    putTag(36, "data"); put32(40, dataLen)
    var i = 0
    while (i < nSamples * channels) {
      val v = sample(i)
      var by = 0
      while (by < bytesPerSample) {
        out(44 + i * bytesPerSample + by) = ((v >>> (8 * by)) & 0xff).toByte
        by += 1
      }
      i += 1
    }
    out
  }

  /** Walk RIFF chunks to the fmt and data chunks (tolerates extra
    * chunks like LIST/INFO between them, per the RIFF spec).
    */
  def decodeWav(bytes: Array[Byte]): Option[WavHeader] = {
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    // Walk offset in Long: a declared chunk len near Int.MaxValue would
    // wrap an Int offset negative and the next tag() read would throw
    // instead of returning None (never-throw decoder contract).
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var dataLen = -1
    while (off + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val o = off.toInt
      val id = tag(bytes, o)
      val len = le32(bytes, o + 4)
      if (len < 0) return None // corrupt length — would loop or overflow
      if (id == "fmt " && off + 8 + 16 <= bytes.length)
        fmt = Some((le16(bytes, o + 10), le32(bytes, o + 12), le16(bytes, o + 22)))
      else if (id == "data") dataLen = len
      off += 8L + len + (len & 1) // chunks are word-aligned
    }
    fmt match {
      case Some((ch, rate, bits)) if dataLen >= 0 && ch > 0 && bits >= 8 =>
        Some(WavHeader(rate, ch, bits, dataLen.toLong / (ch * (bits / 8))))
      case _ => None
    }
  }

  /** Decode the PCM payload of a (44-byte-canonical or chunk-walked)
    * WAV: locate the data chunk and read 8-bit unsigned / 16-bit or
    * 24-bit little-endian signed samples, interleaved.
    */
  def decodeWavSamples(bytes: Array[Byte]): Option[(WavHeader, Array[Int])] = {
    val header = decodeWav(bytes).getOrElse(return None)
    // second walk to find the data chunk offset (Long offsets — see
    // decodeWav; a crafted 44-byte header must not pass the bounds
    // check via Int wraparound and then attempt a multi-GB allocation)
    var off = 12L
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && dataOff < 0) {
      val o = off.toInt
      val id = tag(bytes, o)
      val len = le32(bytes, o + 4)
      if (len < 0) return None
      if (id == "data") { dataOff = o + 8; dataLen = len }
      off += 8L + len + (len & 1)
    }
    if (dataOff < 0 || dataOff.toLong + dataLen > bytes.length) return None
    val bps = header.bitsPerSample / 8
    val n = dataLen / bps
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val base = dataOff + i * bps
      out(i) = header.bitsPerSample match {
        case 8 => bytes(base) & 0xff // 8-bit WAV is unsigned
        case 16 => ((bytes(base) & 0xff) | (bytes(base + 1) << 8)).toShort.toInt
        case 24 =>
          val v = (bytes(base) & 0xff) | ((bytes(base + 1) & 0xff) << 8) | (bytes(base + 2) << 16)
          v
        case _ => return None
      }
      i += 1
    }
    Some((header, out))
  }

  /** Encode a minimal ISO-BMFF file: ftyp + a `free` padding box (so
    * decoders must actually WALK boxes, not assume fixed offsets) +
    * moov{mvhd v0}. Total size: 16 + (8 + freePad) + 8 + 108.
    */
  def encodeMp4(timescale: Long, durationTicks: Long, freePad: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def tagW(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    be(16); tagW("ftyp"); tagW("isom"); be(512)
    be(8 + freePad); tagW("free"); (0 until freePad).foreach(_ => out.write(0))
    be(8 + 108); tagW("moov")
    be(108); tagW("mvhd")
    be(0) // version 0 + flags
    be(0); be(0) // creation, modification
    be(timescale); be(durationTicks)
    be(0x00010000L); out.write(0x01); out.write(0); out.write(0); out.write(0) // rate, volume+pad
    (0 until 2).foreach(_ => be(0)) // reserved
    Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(be) // identity matrix
    (0 until 6).foreach(_ => be(0)) // pre_defined
    be(2) // next_track_ID
    out.toByteArray
  }

  /** Find the first `target` box in the sibling run `[from, to)`.
    * size < 8 is malformed; size past the window would overflow Int on
    * crafted 4 GB declarations and walk backwards — both reject.
    */
  private def walkBox(bytes: Array[Byte], from: Int, to: Int, target: String): Option[Int] = {
    var off = from
    while (off + 8 <= to) {
      val size = be32(bytes, off)
      if (size < 8 || size > to - off) return None
      if (tag(bytes, off + 4) == target) return Some(off)
      off += size.toInt
    }
    None
  }

  /** Top-level box walk → moov → mvhd (version 0 or 1). */
  def decodeMp4(bytes: Array[Byte]): Option[Mp4Header] = {
    def walk(from: Int, to: Int, target: String): Option[Int] =
      walkBox(bytes, from, to, target)
    if (bytes.length < 16 || tag(bytes, 4) != "ftyp") return None
    for {
      moov <- walk(0, bytes.length, "moov")
      moovEnd = moov + be32(bytes, moov).toInt
      mvhd <- walk(moov + 8, math.min(moovEnd, bytes.length), "mvhd")
      version = bytes(mvhd + 8) & 0xff
      if mvhd + (if (version == 1) 40 else 28) <= bytes.length
    } yield
      if (version == 1) {
        val ts = be32(bytes, mvhd + 28)
        val dur = (be32(bytes, mvhd + 32) << 32) | be32(bytes, mvhd + 36)
        Mp4Header(ts, dur)
      } else
        Mp4Header(be32(bytes, mvhd + 20), be32(bytes, mvhd + 24))
  }

  // ------------------------------------------------- sample tables (stbl)

  private def be32Bytes(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def boxBytes(tag4: String, payloads: Array[Byte]*): Array[Byte] = {
    val len = 8 + payloads.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(len)
    out.write(be32Bytes(len), 0, 4)
    out.write(tag4.getBytes("US-ASCII"), 0, 4)
    payloads.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  private def mvhdBox(timescale: Long, durationTicks: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(108)
    def be(v: Long): Unit = out.write(be32Bytes(v), 0, 4)
    be(0) // version 0 + flags
    be(0); be(0) // creation, modification
    be(timescale); be(durationTicks)
    be(0x00010000L); out.write(0x01); out.write(0); out.write(0); out.write(0) // rate, volume+pad
    (0 until 2).foreach(_ => be(0)) // reserved
    Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(be) // identity matrix
    (0 until 6).foreach(_ => be(0)) // pre_defined
    be(2) // next_track_ID
    boxBytes("mvhd", out.toByteArray)
  }

  /** Encode an ISO-BMFF file WITH a demuxable sample table:
    * ftyp + free(pad) + moov{ mvhd, trak{ mdia{ minf{ stbl{
    * stts, stsc, stsz, stco }}}}}.
    *
    * One stts run (`sampleDelta` per sample), one stsc entry
    * (`samplesPerChunk`), per-sample stsz sizes, 32-bit stco offsets at
    * `chunkBase + chunk·chunkStride` — the structure §8.5–8.7 mandates,
    * sized closed-form so oracles can predict every byte position:
    * total = 260 + pad + 4·n + 4·ceil(n / spc).
    */
  def encodeMp4Track(
      timescale: Long,
      durationTicks: Long,
      freePad: Int,
      sampleSizes: Seq[Int],
      samplesPerChunk: Int,
      sampleDelta: Long,
      chunkBase: Long = 1000L,
      chunkStride: Long = 4096L): Array[Byte] = {
    require(samplesPerChunk >= 1 && sampleSizes.nonEmpty, "need samples")
    val n = sampleSizes.length
    val nChunks = (n + samplesPerChunk - 1) / samplesPerChunk
    val stts = boxBytes("stts",
      be32Bytes(0), be32Bytes(1), be32Bytes(n.toLong), be32Bytes(sampleDelta))
    val stsc = boxBytes("stsc",
      be32Bytes(0), be32Bytes(1),
      be32Bytes(1), be32Bytes(samplesPerChunk.toLong), be32Bytes(1))
    val stsz = boxBytes("stsz",
      Array(be32Bytes(0), be32Bytes(0) /* per-sample sizes */ , be32Bytes(n.toLong)) ++
        sampleSizes.map(s => be32Bytes(s.toLong)): _*)
    val stco = boxBytes("stco",
      Array(be32Bytes(0), be32Bytes(nChunks.toLong)) ++
        (0 until nChunks).map(c => be32Bytes(chunkBase + c * chunkStride)): _*)
    val stbl = boxBytes("stbl", stts, stsc, stsz, stco)
    val moov = boxBytes("moov",
      mvhdBox(timescale, durationTicks),
      boxBytes("trak", boxBytes("mdia", boxBytes("minf", stbl))))
    val out = new java.io.ByteArrayOutputStream()
    out.write(boxBytes("ftyp", "isom".getBytes("US-ASCII"), be32Bytes(512)), 0, 16)
    val free = boxBytes("free", new Array[Byte](freePad))
    out.write(free, 0, free.length)
    out.write(moov, 0, moov.length)
    out.toByteArray
  }

  /** Encode a demuxable MP4 whose samples are REAL payload bytes laid
    * out in an `mdat` box — MJPEG-in-MP4: each frame is a complete
    * JPEG, the stsz sizes are the true frame byte lengths and the stco
    * chunk offsets point INTO this file where the frames actually
    * live, so demux → byte-slice → decode works end to end (closing
    * the "parse the tables but can't touch the payload" gap of
    * [[encodeMp4Track]], which carries no media data).
    * Layout: ftyp(16) · free(8+pad) · mdat(8+Σframes) · moov.
    */
  def encodeMp4Mjpeg(
      timescale: Long,
      durationTicks: Long,
      freePad: Int,
      frames: Seq[Array[Byte]],
      samplesPerChunk: Int,
      sampleDelta: Long): Array[Byte] = {
    require(samplesPerChunk >= 1 && frames.nonEmpty, "need frames")
    val n = frames.length
    val nChunks = (n + samplesPerChunk - 1) / samplesPerChunk
    val payloadStart = 16L + (8L + freePad) + 8L
    val sizes = frames.map(_.length)
    val chunkOffsets = (0 until nChunks).map { c =>
      payloadStart + sizes.take(c * samplesPerChunk).map(_.toLong).sum
    }
    val stts = boxBytes("stts",
      be32Bytes(0), be32Bytes(1), be32Bytes(n.toLong), be32Bytes(sampleDelta))
    val stsc = boxBytes("stsc",
      be32Bytes(0), be32Bytes(1),
      be32Bytes(1), be32Bytes(samplesPerChunk.toLong), be32Bytes(1))
    val stsz = boxBytes("stsz",
      Array(be32Bytes(0), be32Bytes(0), be32Bytes(n.toLong)) ++
        sizes.map(s => be32Bytes(s.toLong)): _*)
    val stco = boxBytes("stco",
      Array(be32Bytes(0), be32Bytes(nChunks.toLong)) ++
        chunkOffsets.map(be32Bytes): _*)
    val stbl = boxBytes("stbl", stts, stsc, stsz, stco)
    val moov = boxBytes("moov",
      mvhdBox(timescale, durationTicks),
      boxBytes("trak", boxBytes("mdia", boxBytes("minf", stbl))))
    val out = new java.io.ByteArrayOutputStream()
    out.write(boxBytes("ftyp", "isom".getBytes("US-ASCII"), be32Bytes(512)), 0, 16)
    val free = boxBytes("free", new Array[Byte](freePad))
    out.write(free, 0, free.length)
    val mdat = boxBytes("mdat", frames: _*)
    out.write(mdat, 0, mdat.length)
    out.write(moov, 0, moov.length)
    out.toByteArray
  }

  /** Demux the sample table: moov → trak → mdia → minf → stbl, then
    * join stts (timestamps), stsc (chunk runs), stsz (sizes), stco
    * (chunk offsets) into per-sample rows — size, owning chunk, exact
    * byte offset (chunk offset + cumulative prior sizes in the chunk)
    * and decoding timestamp. Handles multi-run stts and multi-entry
    * stsc (first_chunk runs, 1-based) per the spec; returns None on any
    * structural corruption, never throws.
    */
  def decodeMp4Samples(bytes: Array[Byte]): Option[Seq[Mp4Sample]] = {
    if (bytes.length < 16 || tag(bytes, 4) != "ftyp") return None
    def sub(parent: Int, target: String): Option[Int] = {
      val end = parent + be32(bytes, parent).toInt
      walkBox(bytes, parent + 8, math.min(end, bytes.length), target)
    }
    for {
      moov <- walkBox(bytes, 0, bytes.length, "moov")
      trak <- sub(moov, "trak")
      mdia <- sub(trak, "mdia")
      minf <- sub(mdia, "minf")
      stbl <- sub(minf, "stbl")
      stts <- sub(stbl, "stts")
      stsc <- sub(stbl, "stsc")
      stsz <- sub(stbl, "stsz")
      stco <- sub(stbl, "stco")
      samples <- assembleSamples(bytes, stts, stsc, stsz, stco)
    } yield samples
  }

  private def assembleSamples(
      bytes: Array[Byte], stts: Int, stsc: Int, stsz: Int, stco: Int): Option[Seq[Mp4Sample]] = {
    def u32(off: Int): Long = be32(bytes, off)
    def fits(off: Int, need: Long): Boolean = off.toLong + need <= bytes.length
    // stsz: constant size or per-sample table
    val constSize = u32(stsz + 12)
    val n = u32(stsz + 16)
    if (n > Int.MaxValue || n < 0) return None
    val nInt = n.toInt
    if (constSize == 0 && !fits(stsz + 20, 4L * nInt)) return None
    val sizes = (0 until nInt).map(i =>
      if (constSize != 0) constSize else u32(stsz + 20 + 4 * i))
    // stco chunk offsets
    val nChunks = u32(stco + 12)
    if (nChunks > Int.MaxValue || nChunks < 0 || !fits(stco + 16, 4L * nChunks)) return None
    val chunkOffsets = (0 until nChunks.toInt).map(c => u32(stco + 16 + 4 * c))
    // stsc runs: (first_chunk, samples_per_chunk) — expand to per-chunk
    val nRuns = u32(stsc + 12)
    if (nRuns > Int.MaxValue || nRuns < 0 || !fits(stsc + 16, 12L * nRuns)) return None
    val runs = (0 until nRuns.toInt).map { r =>
      (u32(stsc + 16 + 12 * r), u32(stsc + 20 + 12 * r)) // 1-based first_chunk, spc
    }
    if (runs.isEmpty || runs.head._1 != 1) return None
    // first run starts at chunk 1, so every chunk has a governing run
    val spcByChunk = (0 until nChunks.toInt).map(c => runs.takeWhile(_._1 <= c + 1).last._2)
    // stts runs → per-sample decoding timestamps
    val nTimeRuns = u32(stts + 12)
    if (nTimeRuns > Int.MaxValue || nTimeRuns < 0 || !fits(stts + 16, 8L * nTimeRuns)) return None
    val dts = new Array[Long](nInt)
    var s = 0
    var t = 0L
    var r = 0
    while (r < nTimeRuns.toInt && s < nInt) {
      val count = u32(stts + 16 + 8 * r)
      val delta = u32(stts + 20 + 8 * r)
      var i = 0L
      while (i < count && s < nInt) {
        dts(s) = t; t += delta; s += 1; i += 1
      }
      r += 1
    }
    if (s < nInt) return None // stts covers fewer samples than stsz declares
    // assign samples to chunks sequentially, offsets cumulative in-chunk
    val out = Vector.newBuilder[Mp4Sample]
    var sample = 0
    var chunk = 0
    while (sample < nInt && chunk < chunkOffsets.length) {
      var inChunk = 0L
      var off = chunkOffsets(chunk)
      while (inChunk < spcByChunk(chunk) && sample < nInt) {
        out += Mp4Sample(sample, sizes(sample), chunk, off, dts(sample))
        off += sizes(sample)
        sample += 1
        inChunk += 1
      }
      chunk += 1
    }
    if (sample < nInt) return None // more samples than the chunk map holds
    Some(out.result())
  }
}
