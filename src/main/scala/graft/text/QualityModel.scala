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
    classifyScored(docs, idCol, textCol,
      score(col(textCol), numBuckets, salt))

  /** [[classify]] with TRAINED weights from a `(bucket, weight)` table
    * instead of the hash derivation — the swap-in path the
    * hash-derived gate exercises structurally. The table is
    * model-sized (≤ `numBuckets` rows — the codebook-collect class),
    * so it rides to every task as one literal lookup array and scoring
    * stays the same zero-shuffle codegen'd fold; buckets absent from
    * the table weigh 0. `QualityModelSpec` pins this ≡ [[classify]]
    * when fed the hash-derived weights as a table.
    */
  def classifyWithWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int,
      weights: DataFrame): DataFrame = {
    val lut = Array.fill(numBuckets)(0L)
    weights.select(col("bucket").cast("long"), col("weight").cast("long"))
      .collect().foreach(r => lut(r.getLong(0).toInt) = r.getLong(1))
    val scoreCol = aggregate(
      transform(split(col(textCol), " "),
        t => element_at(typedlit(lut.toSeq), (bucket(t, numBuckets) + 1).cast("int"))),
      lit(0L),
      (acc, w) => acc + w)
    classifyScored(docs, idCol, textCol, scoreCol)
  }

  private def classifyScored(docs: DataFrame, idCol: String, textCol: String,
                             scoreCol: Column): DataFrame =
    docs.select(
      col(idCol),
      graft.functions.Exprs.tokenCount(col(textCol)).as("n_tokens"),
      scoreCol.as("score"))
      .withColumn("kept", when(col("score") > 0, 1L).otherwise(0L))
}
