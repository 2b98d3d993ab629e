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

  /** Top-level box walk → moov → mvhd (version 0 or 1). */
  def decodeMp4(bytes: Array[Byte]): Option[Mp4Header] = {
    def walk(from: Int, to: Int, target: String): Option[Int] = {
      var off = from
      while (off + 8 <= to) {
        val size = be32(bytes, off)
        // size < 8 is malformed; size past the window would overflow
        // Int on crafted 4 GB declarations and walk backwards
        if (size < 8 || size > to - off) return None
        if (tag(bytes, off + 4) == target) return Some(off)
        off += size.toInt
      }
      None
    }
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
}
