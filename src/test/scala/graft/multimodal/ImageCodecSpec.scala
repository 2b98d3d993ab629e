package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ImageCodec verified against the JDK's own independent PNG
  * implementation (javax.imageio) in both directions, plus marker-level
  * JPEG fixtures — no Spark needed.
  */
class ImageCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int)(x: Int, y: Int): Int = (x * 7 + y * 13) % 256

  test("sniff: magic bytes classify PNG / JPEG / unknown") {
    val png = ImageCodec.encodeGrayPng(4, 3, gradient(4, 3))
    assert(ImageCodec.sniff(png) === "png")
    assert(ImageCodec.sniff(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)) === "jpeg")
    assert(ImageCodec.sniff("not an image".getBytes) === "unknown")
    assert(ImageCodec.sniff(Array.emptyByteArray) === "unknown")
  }

  test("encodeGrayPng: ImageIO (independent decoder) reads back exact dims and pixels") {
    val (w, h) = (23, 17)
    val bytes = ImageCodec.encodeGrayPng(w, h, gradient(w, h))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img !== null, "ImageIO rejected our PNG")
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val gray = img.getRaster.getSample(x, y, 0)
      assert(gray === gradient(w, h)(x, y), s"pixel ($x,$y)")
    }
  }

  test("encodeGrayPng: closed-form byte length 68 + h*(w+1)") {
    for ((w, h) <- Seq((1, 1), (8, 8), (31, 31), (100, 40))) {
      val n = ImageCodec.encodeGrayPng(w, h, (_, _) => 0).length
      assert(n === 68 + h * (w + 1), s"${w}x$h")
    }
  }

  test("decodePng: decodes ImageIO-written PNGs (real deflate + row filters)") {
    // ImageIO uses genuine compressed deflate streams and its own filter
    // heuristics — if our inflate/unfilter path only handled our own
    // stored-block output, this would catch it.
    val (w, h) = (29, 21)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, gradient(w, h)(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val Some((header, px)) = ImageCodec.decodePng(out.toByteArray)
    assert(header.width === w && header.height === h && header.channels === 1)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === gradient(w, h)(x, y), s"pixel ($x,$y)")
  }

  test("decodePng: RGB ImageIO round trip (3-channel raster)") {
    val (w, h) = (11, 9)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 31) % 256 << 16) | ((y * 17) % 256 << 8) | ((x + y) % 256))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val Some((header, px)) = ImageCodec.decodePng(out.toByteArray)
    assert(header.width === w && header.height === h && header.channels === 3)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      assert((px(base) & 0xff) === (x * 31) % 256, s"R ($x,$y)")
      assert((px(base + 1) & 0xff) === (y * 17) % 256, s"G ($x,$y)")
      assert((px(base + 2) & 0xff) === (x + y) % 256, s"B ($x,$y)")
    }
  }

  test("decodeHeader: JPEG SOF0 segment yields dims; SOS-before-SOF and truncation yield None") {
    // Minimal marker stream: SOI, APP0 (stub), SOF0 with h=480 w=640,
    // 3 components. Header parse never needs entropy-coded data.
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val jpeg = b(0xff, 0xd8) ++ // SOI
      b(0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46) ++ // APP0 len=4
      b(0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0xe0, 0x02, 0x80, 0x03) ++ // SOF0: prec 8, 480x640, 3 comp
      b(0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00) ++
      b(0xff, 0xd9) // EOI
    val Some(h) = ImageCodec.decodeHeader(jpeg)
    assert(h.format === "jpeg" && h.width === 640 && h.height === 480 && h.channels === 3)
    // Progressive (SOF2) parses identically.
    val prog = jpeg.clone(); prog(9) = 0xc2.toByte
    assert(ImageCodec.decodeHeader(prog).map(_.width) === Some(640))
    assert(ImageCodec.decodeHeader(b(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02)) === None)
    assert(ImageCodec.decodeHeader(jpeg.take(12)) === None)
  }

  test("decodePng: chunk length near Int.MaxValue returns None, never throws") {
    // A declared IDAT len of 0x7FFFFFF0 made the Int bounds check
    // (i + 8 + len > length) wrap negative and falsely pass, then the
    // chunk read threw IndexOutOfBounds — killing the executor task on
    // a single corrupt asset. Bounds math must run in Long.
    val good = ImageCodec.encodeGrayPng(4, 3, gradient(4, 3))
    val crafted = good.take(33) ++ // sig + full IHDR chunk
      Array[Byte](0x7f, 0xff.toByte, 0xff.toByte, 0xf0.toByte) ++ // len = 0x7FFFFFF0
      "IDAT".getBytes("US-ASCII")
    assert(ImageCodec.decodePng(crafted) === None)
    assert(ImageCodec.decodeHeader(crafted).isDefined) // header-only path still fine
  }

  test("decodePng: crafted giant/negative IHDR dims return None, never allocate") {
    def patchDims(w: Int, h: Int): Array[Byte] = {
      val b = ImageCodec.encodeGrayPng(4, 3, gradient(4, 3)).clone()
      def put32(off: Int, v: Int): Unit = {
        b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
        b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
      }
      put32(16, w); put32(20, h)
      b
    }
    // 40000x40000 gray = 1.6 GB raster from a 100-byte file: the IDAT
    // stream can't back it (deflate expands ≤1032:1) — reject, don't OOM.
    assert(ImageCodec.decodePng(patchDims(40000, 40000)) === None)
    // Negative dims via the IHDR sign bit: previously a negative array size.
    assert(ImageCodec.decodePng(patchDims(0x80000001, 3)) === None)
    assert(ImageCodec.decodePng(patchDims(4, 0x80000001)) === None)
    // Overflow of height*(rowBytes+1) in Int while both dims look positive.
    assert(ImageCodec.decodePng(patchDims(0x7fffffff, 0x7fffffff)) === None)
  }

  test("ImageIO-written JPEG: real-world header parse") {
    val img = new java.awt.image.BufferedImage(33, 15, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val Some(h) = ImageCodec.decodeHeader(out.toByteArray)
    assert(h.format === "jpeg" && h.width === 33 && h.height === 15 && h.channels === 3)
  }

  private def blocks(bx: Int, by: Int): Int = (17 * bx + 31 * by + 5) % 256

  test("encodeGrayJpegDc: ImageIO (independent JPEG decoder) reads back exact dims and pixels") {
    // libjpeg-class decoders take the DC-only IDCT shortcut: a constant
    // block decodes to exactly round(dc·q/8)+128, which our encoder makes
    // the original block value — so a fully independent implementation
    // must agree pixel-for-pixel, proving the Huffman stream, stuffing,
    // and DC-diff chain are spec-correct (not just self-consistent).
    val (w, h) = (24, 16)
    val bytes = ImageCodec.encodeGrayJpegDc(w, h, blocks)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img !== null, "ImageIO rejected our JPEG")
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val gray = img.getRaster.getSample(x, y, 0)
      assert(gray === blocks(x / 8, y / 8), s"pixel ($x,$y)")
    }
  }

  test("decodeJpegGrayDc: round trip of every dimension/value shape") {
    for ((w, h) <- Seq((8, 8), (24, 8), (8, 24), (24, 16))) {
      val bytes = ImageCodec.encodeGrayJpegDc(w, h, blocks)
      val Some((header, px)) = ImageCodec.decodeJpegGrayDc(bytes)
      assert(header.width === w && header.height === h && header.channels === 1)
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) === blocks(x / 8, y / 8), s"${w}x$h pixel ($x,$y)")
    }
  }

  test("decodeJpegGrayDc: general-IDCT JPEGs are sentinel'd (out of profile), never mis-decoded") {
    // An ImageIO-encoded gradient has nonzero AC coefficients — the
    // documented contract is None, not a wrong raster.
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16) img.getRaster.setSample(x, y, 0, (x * 16 + y) % 256)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    assert(ImageCodec.decodeJpegGrayDc(out.toByteArray).isEmpty)
    // Truncated entropy stream: None, never a throw.
    val ours = ImageCodec.encodeGrayJpegDc(24, 24, blocks)
    assert(ImageCodec.decodeJpegGrayDc(ours.dropRight(6)).isEmpty)
  }
}
