package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage with composite pigeonhole blocking — the
  * 100 TB-safe path for edit-distance self-joins (reference analog:
  * `d1`'s within-brand name matching; survey §2 dedup family).
  *
  * A single-key block (brand) is quadratic in block size: at 100× data
  * each block grows 100× and candidate pairs 10 000×. The composite key
  * here is (block, word-position, word): each record explodes into one
  * row per word of its name, and candidates must agree on an aligned
  * word. Pigeonhole: k edits touch at most k words, so any pair within
  * edit distance k whose names share ≥ wordCount−k aligned words meets
  * in at least one block — exact (zero recall loss) whenever at least
  * one word position is untouched by the edit script (i.e. edits don't
  * rewrite every word or shift word boundaries). The d2 gate verifies
  * this empirically: its oracle is the UNBLOCKED semantics, so any
  * recall loss on the corpus fails the hash.
  *
  * Scale shape vs the brand block (measured, sf0.1): candidate pairs
  * 8.0M → 2.0M, and the partition is 460× finer (brand × position ×
  * word vocabulary), so the largest block — what actually bounds a
  * straggler task — shrinks by vocabulary size. For corpora without
  * word structure (URLs, codes), swap the word key for q-gram LSH
  * bands; the join shape is identical.
  */
object FuzzyLinkage {

  /** Self-linkage: pairs (key_a < key_b) within `block` whose `name`s
    * are within `maxDist` edits, blocked on (block, word-pos, word).
    * One shuffle for the block join, one for the pair distinct (a pair
    * meets in up to wordCount blocks); the bounded levenshtein runs
    * after the distinct, once per candidate pair.
    *
    * Single-word guard: a one-word name has no word position an edit
    * can leave untouched, so the pigeonhole argument gives it NOTHING —
    * "abc" vs "abd" (distance 1) share no (pos, word) block and would
    * be silently dropped. Names of exactly one word therefore ALSO pair
    * through a (block, length-band) key against every name in their
    * block — banded all-pairs over the single-word subset only, which
    * is bounded by that subset's size (zero rows on word-structured
    * corpora like part names). This makes the operator exact for every
    * pair involving a single-word name; the remaining lossy shape —
    * both names multi-word with EVERY aligned word touched or
    * word-alignment shifted by an inserted/deleted space — is
    * spec-pinned (`FuzzyLinkageGuardSpec`) and oracle-enforced on the
    * gate corpora (d1/d2's oracles are the unblocked semantics).
    */
  def wordBlockedPairs(
      df: DataFrame,
      keyCol: String,
      blockCol: String,
      nameCol: String,
      maxDist: Int): DataFrame = {
    // Word explode + pair edit-distances amplify per-row work by the
    // block population — spread a single-split scan first (no-op at
    // real scale).
    val src = graft.operators.Scans.spreadSmall(
      df.select(col(keyCol), col(blockCol), col(nameCol)), col(keyCol))
    def side(k: String, n: String): DataFrame =
      src.select(col(keyCol).as(k), col(blockCol).as("__blk"), col(nameCol).as(n))
    val a = side("key_a", "name_a")
    val b = side("key_b", "name_b")
    def words(s: DataFrame, k: String, n: String): DataFrame =
      s.select(col(k), col("__blk"), col(n),
        posexplode(split(col(n), " ")).as(Seq("__pos", "__word")))
    val wordCands = words(a, "key_a", "name_a")
      .join(words(b, "key_b", "name_b"), Seq("__blk", "__pos", "__word"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"))
    // single-word fallback: band the (small) single-word subset against
    // every name in the block by length — |len diff| <= maxDist is
    // implied by the edit bound, so the band loses nothing
    def singles(s: DataFrame, n: String): DataFrame =
      s.filter(size(split(col(n), " ")) === 1)
        .withColumn("__len",
          explode(sequence(length(col(n)) - maxDist, length(col(n)) + maxDist)))
    def withLen(s: DataFrame, n: String): DataFrame =
      s.withColumn("__len", length(col(n)))
    val singleCands = singles(a, "name_a")
      .join(withLen(b, "name_b"), Seq("__blk", "__len"))
      .unionByName(
        withLen(a, "name_a").join(singles(b, "name_b"), Seq("__blk", "__len")))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"))
    val lev: Column = levenshtein(col("name_a"), col("name_b"), maxDist).cast("long")
    wordCands.unionByName(singleCands)
      .distinct()
      // cheap implied-length prefilter so most pairs skip the DP entirely
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", lev)
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("key_a"), col("key_b"), col("dist"))
  }
}
