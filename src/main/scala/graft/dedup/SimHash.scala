package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting: a 28-bit locality-sensitive
  * fingerprint from bag-of-token hashes — documents whose fingerprints
  * are within a small Hamming distance are near-duplicates.
  *
  * Same determinism policy as [[MinHashLSH]]: token hash = first 7 md5
  * hex digits (28 bits), pure integer/bit arithmetic, so a SQL oracle
  * reproduces it exactly.
  *
  * Scale shape: explode tokens (narrow), one shuffle aggregating 28
  * signed bit-sums per doc (map-side combinable), then pair search
  * blocked by a band of the fingerprint (here: the caller's block key),
  * never all-pairs.
  */
object SimHash {

  val Bits = 28

  /** 56-bit variant: at hamming threshold 10, a 28-bit fingerprint
    * admits P[Binomial(28, ½) ≤ 10] ≈ 9% of UNRELATED pairs — the
    * sf10c scale stress measured the m4 result set going quadratic
    * (622M pairs at 500k docs) purely from that saturation. 56 bits
    * push the random-pass rate to ~1e-6, restoring a linear result
    * set at the same threshold (gate m6).
    */
  val WideBits = 56

  def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Second independent 28 bits from the same digest (md5 hex chars
    * 8–14) — together with [[tokenHash]] a 56-bit token hash that any
    * SQL engine reproduces.
    */
  def tokenHashHi(c: Column): Column =
    conv(substring(md5(c), 8, 7), 16, 10).cast("long")

  private def vote(perDoc: DataFrame, idCol: String, bits: Int): DataFrame = {
    val fp = (0 until bits)
      .map(i => when(col(s"bit_$i") > 0, 1L << i).otherwise(0L))
      .reduce(_ + _)
    perDoc.select(col(idCol), fp.as("simhash"))
  }

  /** Per-document 28-bit simhash as a long. Bag semantics: repeated
    * tokens weigh repeatedly (standard simhash).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    // For each bit position: +1 when set, −1 when clear; fingerprint bit
    // is 1 when the sum is positive.
    val bitSums = (0 until Bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"bit_$i")
    }
    val perDoc = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    vote(perDoc, idCol, Bits)
  }

  /** Per-document 56-bit simhash: bits 0–27 from [[tokenHash]], bits
    * 28–55 from [[tokenHashHi]] — the saturation-safe fingerprint for
    * large corpora (see [[WideBits]]).
    */
  def fingerprintsWide(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
      .withColumn("hh", tokenHashHi(col("tok")))
    val bitSums = (0 until WideBits).map { i =>
      val src = if (i < Bits) shiftright(col("h"), i) else shiftright(col("hh"), i - Bits)
      sum(when(src.bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"bit_$i")
    }
    val perDoc = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    vote(perDoc, idCol, WideBits)
  }

  /** Near-dup pairs within a block: Hamming distance ≤ maxDistance.
    * `blockCol` bounds the candidate set (at 100 TB this is a fingerprint
    * band or LSH bucket, not a metadata column).
    *
    * Skew-safe: the block self-join uses the same triangle
    * sub-blocking as [[graft.similarity.Ann.nearDupPairs]] — join key
    * `(blk, blockA, blockB)` over deterministic `hash(id) mod S`
    * sub-blocks, so a 100k-doc hot block's pair workload spreads over
    * S(S+1)/2 keys instead of one reducer, with bit-identical output.
    */
  def nearPairs(
      fps: DataFrame,
      idCol: String,
      blockCol: String,
      maxDistance: Int,
      subBlocks: Int = 8): DataFrame = {
    val sb = pmod(xxhash64(col(idCol)), lit(subBlocks.toLong)).cast("int")
    val a = fps
      .select(col(idCol).as("id_a"), col(blockCol).as("blk"), col("simhash").as("fp_a"),
        sb.as("ba"))
      .withColumn("bb", explode(sequence(col("ba"), lit(subBlocks - 1))))
    val b = fps
      .select(col(idCol).as("id_b"), col(blockCol).as("blk"), col("simhash").as("fp_b"),
        sb.as("bb"))
      .withColumn("ba", explode(sequence(lit(0), col("bb"))))
    a.join(b, Seq("blk", "ba", "bb"))
      .filter(col("ba") =!= col("bb") || col("id_a") < col("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxDistance)
  }
}
