package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rolling-hash chunking contracts: the Catalyst HOF pipeline agrees
  * with a plain Scala reference on arbitrary ASCII text, short texts
  * yield zero windows (never a reversed sequence), and boundaries are
  * content-defined — an edit moves only the boundaries whose windows
  * overlap it.
  */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def refHashes(s: String): Seq[Long] =
    (0 to s.length - TextOps.rhWindow).map { i =>
      (0 until TextOps.rhWindow)
        .map(j => s(i + j).toLong * TextOps.rhPowers(TextOps.rhWindow - 1 - j))
        .sum % TextOps.rhMod
    }

  private def refBoundaries(s: String): Seq[Int] =
    refHashes(s).zipWithIndex.collect {
      case (h, i) if h % TextOps.rhDiv == 0 => i + 1 // 1-based
    }

  test("boundary profile matches the Scala reference, including texts shorter than the window") {
    val texts = Seq(
      "", "abc", "exactly8", // 0, 0, 1 windows
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaa", // uniform content
      (1 to 400).map(i => ('a' + i % 26).toChar).mkString)
    val out = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextOps.rollingHashBoundaries(out, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    texts.zip(got).foreach { case (t, (_, nw, nb, bs, hs)) =>
      val bounds = refBoundaries(t)
      assert(nw == math.max(t.length - TextOps.rhWindow + 1, 0), t.take(20))
      assert(nb == bounds.length, t.take(20))
      assert(bs == bounds.map(_.toLong).sum, t.take(20))
      assert(hs == refHashes(t).sum, t.take(20))
    }
  }

  test("content-defined: an edit shifts later boundaries but preserves them (fixed grids don't)") {
    val base = (1 to 300).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val edited = base.substring(0, 150) + "X" + base.substring(150)
    val b0 = refBoundaries(base)
    val b1 = refBoundaries(edited)
    // Boundaries strictly before the edit window are identical…
    assert(b0.takeWhile(_ < 150 - TextOps.rhWindow) ==
      b1.takeWhile(_ < 150 - TextOps.rhWindow))
    // …and boundaries after it survive, shifted by exactly the insert
    // length — the property that makes CDC dedup robust to edits.
    assert(b0.filter(_ > 150).map(_ + 1).toSet.subsetOf(b1.toSet))
  }
}
