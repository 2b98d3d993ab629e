package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MODEL-BASED quality filtering — the fastText-style classifier pass
  * every production curation stack runs after the heuristic filters
  * (t2/t21/t23): hash each token into a bucket, look up the bucket's
  * weight in a frozen linear model, score the document by the mean
  * token weight, keep docs above threshold.
  *
  * The model here is hash-DERIVED rather than hash-LOADED: weight(b) =
  * (28-bit md5 prefix of "salt:b") % 201 − 100 ∈ [−100, 100], i.e. a
  * frozen pseudo-random linear head. That keeps the gate self-contained
  * (no weight file) while exercising the exact production plan shape —
  * swapping in trained weights is a broadcast join against a (bucket,
  * weight) table and changes nothing structural. Scoring is exact
  * integer arithmetic end-to-end, so the oracle replays it
  * bit-for-bit; the keep decision compares score to 0 (mean-weight
  * threshold by cross-multiplication — no float division).
  *
  * Scale shape: scoring is a narrow per-document fold over the token
  * array (hash → weight → sum inside one codegen'd higher-order
  * expression) — ZERO shuffle, rides the scan, embarrassingly parallel
  * at any corpus size. This is deliberately the same cost class as the
  * heuristic filters it sits beside.
  */
object QualityModel {

  /** 28-bit md5-prefix integer of a string column — the engine-portable
    * hash the dedup pipeline standardizes on (MinHashLSH.shingleHash).
    */
  private def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Feature bucket of a token. */
  def bucket(tok: Column, numBuckets: Int): Column = h28(tok) % numBuckets

  /** Frozen model weight of a bucket: uniform in [-100, 100]. */
  def weight(b: Column, salt: String): Column =
    h28(concat(lit(salt + ":"), b.cast("string"))) % 201 - 100

  /** Per-document integer score: Σ over tokens of weight(bucket(tok)).
    * One higher-order fold, no explode, no shuffle.
    */
  def score(textCol: Column, numBuckets: Int, salt: String): Column =
    aggregate(
      transform(split(textCol, " "), t => weight(bucket(t, numBuckets), salt)),
      lit(0L),
      (acc, w) => acc + w)

  /** Score + keep decision per document. `kept` = mean token weight
    * above zero, decided as score > 0 (denominator positive).
    */
  def classify(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int,
      salt: String): DataFrame =
    docs.select(
      col(idCol),
      graft.functions.Exprs.tokenCount(col(textCol)).as("n_tokens"),
      score(col(textCol), numBuckets, salt).as("score"))
      .withColumn("kept", when(col("score") > 0, 1L).otherwise(0L))
}
