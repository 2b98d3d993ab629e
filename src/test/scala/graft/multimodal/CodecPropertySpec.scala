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

  test("MP4 stbl property: random sample tables round-trip sizes, chunks, offsets, timestamps") {
    val gen = for {
      n <- Gen.choose(1, 60)
      spc <- Gen.choose(1, 7)
      delta <- Gen.choose(1L, 5000L)
      pad <- Gen.choose(0, 40)
      sizeSeed <- Gen.choose(0, 1 << 20)
    } yield (n, spc, delta, pad, sizeSeed)
    forAllSamples(gen) { case (n, spc, delta, pad, sizeSeed) =>
      val sizes = (0 until n).map(i => 1 + ((sizeSeed + i * 31) % 500))
      val bytes = MediaCodec.encodeMp4Track(600, 999, pad, sizes, spc, delta)
      val Some(samples) = MediaCodec.decodeMp4Samples(bytes)
      assert(samples.length === n)
      assert(samples.map(_.size) === sizes.map(_.toLong))
      // independent reconstruction of chunk / offset / dts
      samples.zipWithIndex.foreach { case (s, i) =>
        val chunk = i / spc
        val within = (chunk * spc until i).map(sizes(_).toLong).sum
        assert(s.chunk === chunk, s"chunk of sample $i")
        assert(s.offset === 1000L + 4096L * chunk + within, s"offset of sample $i")
        assert(s.dts === i * delta, s"dts of sample $i")
      }
      // the mvhd parse must coexist with the trak
      assert(MediaCodec.decodeMp4(bytes) === Some(MediaCodec.Mp4Header(600, 999)))
    }
  }

  test("fuzz safety: random bytes never throw from any decoder") {
    def all(bytes: Array[Byte]): Unit = {
      ImageCodec.decodeHeader(bytes); ImageCodec.decodePng(bytes)
      MediaCodec.decodeWav(bytes); MediaCodec.decodeWavSamples(bytes)
      MediaCodec.decodeMp4(bytes); MediaCodec.decodeMp4Samples(bytes)
    }
    val rnd = new scala.util.Random(99)
    (1 to 300).foreach { _ =>
      all(Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
    }
    // Structured corruption: valid prefixes with truncated/flipped tails.
    val png = ImageCodec.encodeGrayPng(9, 7, (x, y) => x + y)
    val wav = MediaCodec.encodeWavPcm(8000, 1, 16, 50, _ => 0)
    val mp4 = MediaCodec.encodeMp4(600, 100, 5)
    val mp4t = MediaCodec.encodeMp4Track(600, 100, 5, Seq(10, 20, 30), 2, 40)
    Seq(png, wav, mp4, mp4t).foreach { good =>
      (0 until good.length by 7).foreach(cut => all(good.take(cut)))
      (0 until good.length by 11).foreach { flip =>
        val m = good.clone(); m(flip) = (m(flip) ^ 0x55).toByte
        all(m)
      }
    }
    succeed
  }
}
