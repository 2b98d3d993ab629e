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

  // --------------------------------------------------------------- JPEG
  //
  // Grayscale baseline JPEG, DC-only profile (ITU T.81): every 8×8 block
  // is a constant value, so the forward DCT has a single DC coefficient
  // (8·(v−128), AC all zero) and with quantizer 8 the round trip is EXACT
  // integer arithmetic — pixel in == pixel out, which is what lets a SQL
  // oracle predict decoded rasters closed-form. The decoder still runs
  // the full real pipeline: marker walk, DQT, canonical-Huffman DHT
  // build, SOF0, SOS entropy decode with byte unstuffing, DC-diff EXTEND,
  // dequantization and level shift. Payloads whose scan carries nonzero
  // AC coefficients are outside the profile and return None (the
  // documented sentinel contract — general IDCT is out of scope).

  /** MSB-first bit writer with JPEG byte stuffing (0xFF → 0xFF 0x00). */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(value: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { put((1 << (8 - n)) - 1, 8 - n) }
  }

  /** Encode a grayscale DC-only baseline JPEG: one constant value per
    * 8×8 block (`blockVal(bx, by)` ∈ 0..255), dimensions any positive
    * multiple of 8. Custom minimal-but-legal Huffman tables: 12 DC
    * categories at 4 bits each, a 1-bit AC table holding only EOB.
    */
  def encodeGrayJpegDc(width: Int, height: Int, blockVal: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
      s"DC-only profile needs multiple-of-8 dims, got ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def w16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xdb); w16(67); out.write(0x00) // DQT table 0, 8-bit
    (0 until 64).foreach(_ => out.write(8))
    m(0xc0); w16(11); out.write(8); w16(height); w16(width) // SOF0
    out.write(1); out.write(1); out.write(0x11); out.write(0) // 1 comp, 1:1, q0
    m(0xc4); w16(31); out.write(0x00) // DHT DC class 0 id 0
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcBits.foreach(out.write)
    (0 until 12).foreach(out.write) // category s → canonical code s (4 bits)
    m(0xc4); w16(20); out.write(0x10) // DHT AC class 1 id 0
    val acBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acBits.foreach(out.write)
    out.write(0x00) // single symbol: EOB, canonical code "0"
    m(0xda); w16(8); out.write(1); out.write(1); out.write(0x00) // SOS
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl
    val bw = new BitWriter(out)
    var pred = 0
    var by = 0
    while (by < height / 8) {
      var bx = 0
      while (bx < width / 8) {
        val coef = blockVal(bx, by) - 128 // quantized DC: 8·(v−128) / q0=8
        val diff = coef - pred
        pred = coef
        val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        bw.put(s, 4) // DC category (code == symbol by table construction)
        if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        bw.put(0, 1) // EOB: no AC coefficients
        bx += 1
      }
      by += 1
    }
    bw.flush()
    m(0xd9) // EOI
    out.toByteArray
  }

  /** Canonical Huffman decode tables per ITU T.81 Annex C/F: per code
    * length, the first code value and the offset into `vals`.
    */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var p = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) maxCode(l) = -1
        else {
          valPtr(l) = p
          minCode(l) = code
          code += bits(l - 1)
          p += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def symbol(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  /** MSB-first bit reader over the entropy-coded segment with byte
    * unstuffing; any marker (0xFF followed by non-zero) ends the data.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    /** -1 = ran out of entropy data. */
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) return -1
        val v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length || b(pos) != 0) return -1 // marker, not data
          pos += 1 // skip stuffed 0x00
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def bits(count: Int): Int = {
      var v = 0
      var i = 0
      while (i < count) {
        val bt = bit()
        if (bt < 0) return -1
        v = (v << 1) | bt
        i += 1
      }
      v
    }
    def huff(h: Huff): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val bt = bit()
        if (bt < 0) return -1
        code = (code << 1) | bt
        len += 1
        if (h.maxCode(len) >= 0 && code <= h.maxCode(len) && code >= h.minCode(len))
          return h.symbol(len, code)
      }
      -1
    }
  }

  /** Decode a grayscale DC-only baseline JPEG (the [[encodeGrayJpegDc]]
    * profile): returns the header and the row-major 8-bit raster, or
    * None for anything outside the profile — progressive/multi-component
    * scans, nonzero AC coefficients, 16-bit quantizers, truncated or
    * corrupt streams. Never throws.
    */
  def decodeJpegGrayDc(bytes: Array[Byte]): Option[(ImageHeader, Array[Byte])] = {
    if (sniff(bytes) != "jpeg") return None
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var width = 0; var height = 0; var qId = 0
    var i = 2
    while (i + 4 <= bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None
      val marker = bytes(i + 1) & 0xff
      val len = be16(bytes, i + 2)
      if (len < 2 || i.toLong + 2 + len > bytes.length) return None
      val seg = i + 4
      val segEnd = i + 2 + len
      marker match {
        case 0xdb => // DQT: one or more tables
          var p = seg
          while (p < segEnd) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            if (pq != 0 || tq > 3 || p + 65 > segEnd) return None
            quant(tq) = (1 to 64).map(j => bytes(p + j) & 0xff).toArray
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = seg
          while (p + 17 <= segEnd) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            val tabBits = (1 to 16).map(j => bytes(p + j) & 0xff).toArray
            val nv = tabBits.sum
            if (th > 3 || p + 17 + nv > segEnd) return None
            val vals = (0 until nv).map(j => bytes(p + 17 + j) & 0xff).toArray
            val h = new Huff(tabBits, vals)
            if (tc == 0) dcTables(th) = h
            else if (tc == 1) acTables(th) = h
            else return None
            p += 17 + nv
          }
        case 0xc0 => // SOF0 baseline
          if (len < 11 || (bytes(seg) & 0xff) != 8) return None
          height = be16(bytes, seg + 1)
          width = be16(bytes, seg + 3)
          if ((bytes(seg + 5) & 0xff) != 1) return None // grayscale only
          if ((bytes(seg + 7) & 0xff) != 0x11) return None // 1:1 sampling
          qId = bytes(seg + 8) & 0x0f
        case mk if mk >= 0xc1 && mk <= 0xcf && mk != 0xc4 && mk != 0xc8 =>
          return None // progressive / extended / arithmetic: out of profile
        case 0xda => // SOS: entropy-coded data follows
          if (width <= 0 || height <= 0 || quant(qId) == null) return None
          if ((bytes(seg) & 0xff) != 1) return None
          val td = (bytes(seg + 2) & 0xff) >> 4
          val ta = bytes(seg + 2) & 0x0f
          val dcH = dcTables(td); val acH = acTables(ta)
          if (dcH == null || acH == null) return None
          val q0 = quant(qId)(0)
          val bw = (width + 7) / 8; val bh = (height + 7) / 8
          val px = new Array[Byte](width * height)
          val br = new BitReader(bytes, segEnd)
          var dc = 0
          var blk = 0
          while (blk < bw * bh) {
            val s = br.huff(dcH)
            if (s < 0 || s > 11) return None
            if (s > 0) {
              val v = br.bits(s)
              if (v < 0) return None
              dc += (if (v < (1 << (s - 1))) v - (1 << s) + 1 else v) // EXTEND
            }
            // AC scan: EOB and ZRL keep the block constant; any nonzero
            // AC coefficient leaves the DC-only profile.
            var k = 1
            var eob = false
            while (!eob && k <= 63) {
              val rs = br.huff(acH)
              if (rs < 0) return None
              if (rs == 0x00) eob = true
              else if (rs == 0xf0) k += 16
              else return None // nonzero AC: out of profile
            }
            // dequantize + 1-D DC inverse + level shift, exact integers
            val value = (((dc * q0) + 4) >> 3) + 128
            val v8 = (if (value < 0) 0 else if (value > 255) 255 else value).toByte
            val bx = blk % bw; val byy = blk / bw
            var y = byy * 8
            while (y < math.min(byy * 8 + 8, height)) {
              var x = bx * 8
              while (x < math.min(bx * 8 + 8, width)) {
                px(y * width + x) = v8
                x += 1
              }
              y += 1
            }
            blk += 1
          }
          return Some((ImageHeader("jpeg", width, height, 1), px))
        case 0xd9 => return None // EOI before any scan
        case _ => () // APPn / COM / DRI etc.: skip
      }
      i = segEnd
    }
    None
  }
}
