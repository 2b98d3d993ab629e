package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the codecs: random round trips and fuzz safety.
  * The decoders run inside `mapPartitions` on executors, where an
  * uncaught exception kills the whole task — malformed bytes must come
  * back as None, never throw.
  */
class CodecPropertySpec extends AnyFunSuite {

  private def forAllSamples[A](gen: Gen[A], n: Int = 20)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(1337L + i)).get)
    }

  test("PNG property: encode→decode round-trips random rasters exactly") {
    val gen = for {
      w <- Gen.choose(1, 48)
      h <- Gen.choose(1, 48)
      seed <- Gen.choose(0, 1 << 20)
    } yield (w, h, seed)
    forAllSamples(gen) { case (w, h, seed) =>
      def px(x: Int, y: Int): Int = (x * 31 + y * 17 + seed) % 256
      val Some((header, raster)) = ImageCodec.decodePng(ImageCodec.encodeGrayPng(w, h, px))
      assert(header.width === w && header.height === h && header.channels === 1)
      for (y <- 0 until h; x <- 0 until w)
        assert((raster(y * w + x) & 0xff) === px(x, y))
    }
  }

  test("WAV property: header round-trips random formats") {
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 22050, 44100)
      ch <- Gen.choose(1, 4)
      bits <- Gen.oneOf(8, 16, 24)
      n <- Gen.choose(1, 2000)
    } yield (rate, ch, bits, n)
    forAllSamples(gen) { case (rate, ch, bits, n) =>
      val bytes = MediaCodec.encodeWavPcm(rate, ch, bits, n, i => i)
      assert(MediaCodec.decodeWav(bytes) ===
        Some(MediaCodec.WavHeader(rate, ch, bits, n.toLong)))
    }
  }

  test("MP4 property: mvhd round-trips random durations and pads") {
    val gen = for {
      ts <- Gen.choose(1L, 1000000L)
      dur <- Gen.choose(0L, Int.MaxValue.toLong)
      pad <- Gen.choose(0, 200)
    } yield (ts, dur, pad)
    forAllSamples(gen) { case (ts, dur, pad) =>
      assert(MediaCodec.decodeMp4(MediaCodec.encodeMp4(ts, dur, pad)) ===
        Some(MediaCodec.Mp4Header(ts, dur)))
    }
  }

  test("fuzz safety: random bytes never throw from any decoder") {
    val rnd = new scala.util.Random(99)
    (1 to 300).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      ImageCodec.decodeHeader(bytes); ImageCodec.decodePng(bytes)
      MediaCodec.decodeWav(bytes); MediaCodec.decodeMp4(bytes)
    }
    // Structured corruption: valid prefixes with truncated/flipped tails.
    val png = ImageCodec.encodeGrayPng(9, 7, (x, y) => x + y)
    val wav = MediaCodec.encodeWavPcm(8000, 1, 16, 50, _ => 0)
    val mp4 = MediaCodec.encodeMp4(600, 100, 5)
    Seq(png, wav, mp4).foreach { good =>
      (0 until good.length by 7).foreach { cut =>
        val t = good.take(cut)
        ImageCodec.decodePng(t); MediaCodec.decodeWav(t); MediaCodec.decodeMp4(t)
      }
      (0 until good.length by 11).foreach { flip =>
        val m = good.clone(); m(flip) = (m(flip) ^ 0x55).toByte
        ImageCodec.decodePng(m); MediaCodec.decodeWav(m); MediaCodec.decodeMp4(m)
      }
    }
    succeed
  }
}
