package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The exactness envelope of word-blocked fuzzy linkage: single-word
  * names are exact via the length-band guard; the documented residual
  * lossy shape (multi-word with every aligned word touched) is pinned
  * so the contract stays explicit rather than corpus-dependent folklore.
  */
class FuzzyLinkageGuardSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], maxDist: Int = 2) =
    FuzzyLinkage
      .wordBlockedPairs(
        rows.toDF("id", "name").withColumn("blk", lit(1)),
        "id", "blk", "name", maxDist)
      .orderBy($"key_a", $"key_b")
      .as[(Long, Long, Long)].collect().toSeq

  test("single-word names within distance are found via the length-band guard") {
    // no shared (pos, word) block exists for any of these pairs — the
    // pre-guard generator silently dropped all of them
    val got = pairs(Seq(1L -> "abc", 2L -> "abd", 3L -> "abcde", 4L -> "zzz"))
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 2L)))
  }

  test("a space-shift edit that leaves one side single-word is found") {
    // "ab cd" vs "abcd": deleting the space shifts every word, so word
    // blocking alone misses the pair; "abcd" is single-word, so the
    // guard bands it against the whole block
    val got = pairs(Seq(1L -> "ab cd", 2L -> "abcd"))
    assert(got == Seq((1L, 2L, 1L)))
  }

  test("documented residual loss: multi-word pair with every aligned word touched") {
    // "aa bb" vs "ax bx" is distance 2 but the two edits touch BOTH
    // words — the pigeonhole has no untouched position and neither name
    // is single-word, so the pair is (by documented contract) dropped.
    // The gate oracles (unblocked SQL) enforce that the gate corpora
    // contain no such shape.
    val got = pairs(Seq(1L -> "aa bb", 2L -> "ax bx"))
    assert(got.isEmpty)
    // the same names with ONE word untouched are found
    val ok = pairs(Seq(1L -> "aa bb", 2L -> "ax bb"))
    assert(ok == Seq((1L, 2L, 1L)))
  }

  test("guard adds no duplicates when both paths find a pair") {
    // single-word identical-length names that also share... nothing to
    // share; mixed corpus where word path and guard path overlap on a
    // (multi, multi) + (single, multi) mix
    val got = pairs(Seq(1L -> "aa bb", 2L -> "aa bx", 3L -> "aabb", 4L -> "aabx"))
    assert(got.map(p => (p._1, p._2)).distinct == got.map(p => (p._1, p._2)))
    assert(got.contains((1L, 2L, 1L)) && got.contains((3L, 4L, 1L)))
  }
}
