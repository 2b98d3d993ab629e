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

  def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

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
    val fp = (0 until Bits)
      .map(i => when(col(s"bit_$i") > 0, 1L << i).otherwise(0L))
      .reduce(_ + _)
    perDoc.select(col(idCol), fp.as("simhash"))
  }

  /** Near-dup pairs within a block: Hamming distance ≤ maxDistance.
    * `blockCol` bounds the candidate set (at 100 TB this is a fingerprint
    * band or LSH bucket, not a metadata column).
    */
  def nearPairs(
      fps: DataFrame,
      idCol: String,
      blockCol: String,
      maxDistance: Int): DataFrame = {
    val a = fps.select(col(idCol).as("id_a"), col(blockCol).as("blk"), col("simhash").as("fp_a"))
    val b = fps.select(col(idCol).as("id_b"), col(blockCol).as("blk"), col("simhash").as("fp_b"))
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxDistance)
      .select("id_a", "id_b", "hamming")
  }
}
