package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** WAV verified against the JDK's independent javax.sound.sampled
  * parser; MP4 against hand-built ISO-BMFF fixtures (the JDK has no
  * MP4 reader).
  */
class MediaCodecSpec extends AnyFunSuite {

  test("encodeWavPcm: JDK AudioSystem reads back the same format") {
    val bytes = MediaCodec.encodeWavPcm(8000, 2, 16, 750, i => i % 256)
    assert(bytes.length === 44 + 750 * 2 * 2)
    val fmt = javax.sound.sampled.AudioSystem
      .getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
    assert(fmt.getFormat.getSampleRate === 8000f)
    assert(fmt.getFormat.getChannels === 2)
    assert(fmt.getFormat.getSampleSizeInBits === 16)
    assert(fmt.getFrameLength === 750)
    val Some(h) = MediaCodec.decodeWav(bytes)
    assert(h === MediaCodec.WavHeader(8000, 2, 16, 750))
  }

  test("decodeWav: walks past extra RIFF chunks; rejects junk") {
    val base = MediaCodec.encodeWavPcm(44100, 1, 16, 10, _ => 0)
    // splice a LIST chunk (odd-length payload → word-aligned walk)
    // between fmt and data
    val listChunk = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      "INFOx".getBytes ++ Array[Byte](0)
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    // fix RIFF size field
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xff).toByte; spliced(5) = ((riffLen >> 8) & 0xff).toByte
    spliced(6) = ((riffLen >> 16) & 0xff).toByte; spliced(7) = ((riffLen >> 24) & 0xff).toByte
    assert(MediaCodec.decodeWav(spliced) === Some(MediaCodec.WavHeader(44100, 1, 16, 10)))
    assert(MediaCodec.decodeWav("RIFFnotawav".getBytes) === None)
    assert(MediaCodec.decodeWav(Array.emptyByteArray) === None)
  }

  test("decodeWavSamples: 16-bit LE round trip including negatives; JDK agrees on bytes") {
    def sample(i: Int): Int = (i * 31) % 65536 - 32768
    val bytes = MediaCodec.encodeWavPcm(8000, 2, 16, 100, sample)
    val Some((h, got)) = MediaCodec.decodeWavSamples(bytes)
    assert(h.nSamples === 100 && got.length === 200)
    got.zipWithIndex.foreach { case (v, i) => assert(v === sample(i), s"sample $i") }
    // 8-bit unsigned path
    val b8 = MediaCodec.encodeWavPcm(8000, 1, 8, 50, i => i % 256)
    val Some((_, got8)) = MediaCodec.decodeWavSamples(b8)
    assert(got8.toSeq === (0 until 50).map(_ % 256))
  }

  test("decodeWav/decodeWavSamples: chunk length near Int.MaxValue returns None, never throws") {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val base = MediaCodec.encodeWavPcm(8000, 1, 8, 4, i => i)
    // Replace the data chunk with a LIST whose declared len = 0x7FFFFFF8:
    // the old Int walk wrapped the offset negative and the next tag()
    // read threw StringIndexOutOfBounds.
    val hugeList = base.take(36) ++ "LIST".getBytes("US-ASCII") ++ le32(0x7ffffff8)
    assert(MediaCodec.decodeWav(hugeList) === None) // no data chunk found, no throw
    // Keep a real fmt+data but declare data len = 0x7FFFFFF0 with no
    // payload: dataOff + dataLen used to wrap past the bounds check and
    // attempt an 8 GB sample-array allocation from a 44-byte file.
    val hugeData = base.take(36) ++ "data".getBytes("US-ASCII") ++ le32(0x7ffffff0)
    assert(MediaCodec.decodeWavSamples(hugeData) === None)
  }

  test("encodeMp4/decodeMp4: box walk skips free box; closed-form size") {
    for (pad <- Seq(0, 7, 31)) {
      val bytes = MediaCodec.encodeMp4(600, 12345L, pad)
      assert(bytes.length === 16 + 8 + pad + 8 + 108, s"pad=$pad")
      assert(MediaCodec.decodeMp4(bytes) === Some(MediaCodec.Mp4Header(600, 12345L)))
    }
    assert(MediaCodec.decodeMp4("nope".getBytes) === None)
    assert(MediaCodec.decodeMp4(MediaCodec.encodeMp4(600, 1, 0).take(30)) === None)
  }

  test("encodeMp4Track/decodeMp4Samples: per-sample sizes, chunks, offsets, timestamps") {
    val sizes = Seq(100, 120, 90, 200, 150) // 5 samples, 2 per chunk → 3 chunks
    val bytes = MediaCodec.encodeMp4Track(600, 5000, freePad = 7, sizes,
      samplesPerChunk = 2, sampleDelta = 40)
    // closed-form total: 260 + pad + 4n + 4*ceil(n/2)
    assert(bytes.length === 260 + 7 + 4 * 5 + 4 * 3)
    // the mvhd header parse must still work with a trak sibling present
    assert(MediaCodec.decodeMp4(bytes) === Some(MediaCodec.Mp4Header(600, 5000)))
    val Some(samples) = MediaCodec.decodeMp4Samples(bytes)
    assert(samples.map(_.size) === sizes.map(_.toLong))
    assert(samples.map(_.chunk) === Seq(0, 0, 1, 1, 2))
    // in-chunk offsets accumulate; chunks sit at 1000 + 4096*c
    assert(samples.map(_.offset) === Seq(1000L, 1100L, 5096L, 5186L, 9192L))
    assert(samples.map(_.dts) === Seq(0L, 40L, 80L, 120L, 160L))
  }

  test("decodeMp4Samples: multi-run stts honored; corruption → None") {
    // Hand-patch the single-run stts into two runs: 2 samples @ delta 10,
    // then 3 @ delta 100 (sizes table unchanged).
    val sizes = Seq(10, 20, 30, 40, 50)
    val base = MediaCodec.encodeMp4Track(600, 5000, 0, sizes, 2, 10)
    // locate stts by tag scan (single occurrence in our encoding)
    val stts = (0 until base.length - 4)
      .find(i => new String(base, i, 4, "US-ASCII") == "stts").get - 4
    def put32(b: Array[Byte], off: Int, v: Long): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
    // grow stts from 1 entry (24 bytes) to 2 entries (32 bytes)
    val patched = base.take(stts) ++ new Array[Byte](32) ++ base.drop(stts + 24)
    put32(patched, stts, 32); patched(stts + 4) = 's'; patched(stts + 5) = 't'
    patched(stts + 6) = 't'; patched(stts + 7) = 's'
    put32(patched, stts + 8, 0); put32(patched, stts + 12, 2) // version, 2 entries
    put32(patched, stts + 16, 2); put32(patched, stts + 20, 10)
    put32(patched, stts + 24, 3); put32(patched, stts + 28, 100)
    // fix enclosing box sizes (stbl, minf, mdia, trak, moov all grew by 8)
    for (tag <- Seq("stbl", "minf", "mdia", "trak", "moov")) {
      val at = (0 until patched.length - 4)
        .find(i => new String(patched, i, 4, "US-ASCII") == tag).get - 4
      val old = ((patched(at) & 0xff) << 24) | ((patched(at + 1) & 0xff) << 16) |
        ((patched(at + 2) & 0xff) << 8) | (patched(at + 3) & 0xff)
      put32(patched, at, old + 8L)
    }
    val Some(samples) = MediaCodec.decodeMp4Samples(patched)
    assert(samples.map(_.dts) === Seq(0L, 10L, 20L, 120L, 220L))
    // truncating the file mid-table must fail clean, not throw
    assert(MediaCodec.decodeMp4Samples(base.take(base.length - 6)) === None)
    assert(MediaCodec.decodeMp4Samples("garbage".getBytes) === None)
  }

  test("decodeMp4: mvhd version 1 (64-bit duration) parses") {
    // Build v0 file, then hand-upgrade mvhd to v1 layout.
    val out = new java.io.ByteArrayOutputStream()
    def be(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    be(16); tag("ftyp"); tag("isom"); be(512)
    be(8 + 120); tag("moov")
    be(120); tag("mvhd")
    out.write(1); out.write(0); out.write(0); out.write(0) // version 1
    be(0); be(0); be(0); be(0) // 64-bit creation + modification
    be(90000) // timescale
    be(1); be(5) // 64-bit duration: hi = 1, lo = 5 → 2^32 + 5
    val bytes0 = out.toByteArray // 64 bytes so far; declared sizes end at 144
    val grown = bytes0 ++ new Array[Byte](144 - bytes0.length)
    assert(MediaCodec.decodeMp4(grown) ===
      Some(MediaCodec.Mp4Header(90000, (1L << 32) | 5L)))
  }
}
