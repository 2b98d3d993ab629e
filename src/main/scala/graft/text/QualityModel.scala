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

  /** TRAIN the linear head IN-ENGINE — the distillation step the
    * hash-derived gate (t26) deliberately skipped: given per-document
    * ±1 labels (in production: curated sources, or the heuristic
    * filter suite being distilled into a servable model), learn a
    * weight vector for [[classifyWithModel]] by the POCKET batch
    * perceptron — per epoch, `w(b) += Σ_{misclassified docs d} y_d ·
    * count_d(b)` (a doc misclassified when `y_d · Σ_b w(b)·x_d(b) ≤
    * 0`), and the RETURNED model is the epoch's weights with the
    * fewest misclassified documents (earliest epoch on ties), not the
    * last — the pocket rule (Gallant 1990), which on non-separable
    * data converts the batch perceptron's oscillation into a
    * monotonically kept best (measured on the t2-label distillation:
    * plain final weights degenerate to keep-everything at base-rate
    * agreement 0.79; the pocket holds 0.91/0.82 at sf0.01/0.1).
    * Feature `numBuckets` is an always-on BIAS (count 1 per doc), so
    * the model can learn a length threshold. EXACT INTEGER arithmetic
    * end-to-end (labels ±1, counts, weights all longs; updates are
    * order-independent sums), so training is deterministic and the
    * DuckDB oracle replays every epoch bit-for-bit — the same
    * discipline as the BPE merge chain (t27b).
    *
    * Scale shape, per epoch: ONE narrow pass over the pre-bucketed
    * corpus — scoring is the [[classifyWithWeights]] literal-lookup
    * fold (zero shuffle, rides the scan), and the update is an
    * explode + `groupBy(bucket)` that map-side combines to ≤
    * `numBuckets`+2 rows per partition before the one tiny exchange
    * (a sentinel −1 "bucket" counts the misclassified docs in the
    * SAME aggregation — one action per epoch). Weights live
    * driver-side between epochs (`numBuckets`+1 longs — the
    * codebook-collect class, same as the PQ codebooks); the bucketed
    * projection is checkpointed ONCE and re-read by every epoch, so
    * the text is split exactly once regardless of epochs. An epoch
    * with zero misclassified documents ends training (its weights are
    * the pocket: 0 errors); the oracle's fixed unrolled epochs agree
    * because later epochs leave the weights unchanged.
    *
    * Returns `numBuckets + 1` longs; index `numBuckets` is the bias.
    */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      numBuckets: Int,
      epochs: Int): Array[Long] = {
    val feat0 = docs.select(
      col(labelCol).cast("long").as("y"),
      concat(
        transform(split(col(textCol), " "), t => bucket(t, numBuckets)),
        array(lit(numBuckets.toLong))).as("bkts"))
    val (feat, tok) = graft.operators.Checkpoints.eager(feat0)
    val w = Array.fill(numBuckets + 1)(0L)
    var best = w.clone()
    var bestMis = Long.MaxValue
    var epoch = 0
    var stop = false
    while (epoch < epochs && !stop) {
      val lut = w.toSeq
      val scoreCol = aggregate(
        col("bkts"), lit(0L),
        (acc, b) => acc + element_at(typedlit(lut), (b + 1).cast("int")))
      val agg = feat
        .where(col("y") * scoreCol <= 0)
        .select(explode(concat(col("bkts"), array(lit(-1L)))).as("bucket"), col("y"))
        .groupBy(col("bucket"))
        .agg(sum(col("y")).as("u"), count(lit(1)).as("c"))
        .collect()
      val nMis = agg.find(_.getLong(0) == -1L).map(_.getLong(2)).getOrElse(0L)
      if (nMis < bestMis) { bestMis = nMis; best = w.clone() }
      if (nMis == 0L) stop = true
      else agg.foreach { r =>
        val b = r.getLong(0)
        if (b >= 0L) w(b.toInt) += r.getLong(1)
      }
      epoch += 1
    }
    tok.free()
    best
  }

  /** [[train]]'s weights as a `(bucket, weight)` table — non-zero rows
    * only (absent buckets weigh 0 on the serving side); the bias, when
    * non-zero, appears as bucket `numBuckets`.
    */
  def weightsTable(spark: org.apache.spark.sql.SparkSession,
                   w: Array[Long]): DataFrame = {
    import spark.implicits._
    w.toSeq.zipWithIndex
      .collect { case (wt, b) if wt != 0L => (b.toLong, wt) }
      .toDF("bucket", "weight")
  }

  /** Serve a [[train]]ed model: [[classifyWithWeights]]' zero-shuffle
    * literal-lookup fold with the bias row (bucket = `numBuckets`)
    * folded in as the accumulator seed.
    */
  def classifyWithModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int,
      weights: DataFrame): DataFrame = {
    val lut = Array.fill(numBuckets + 1)(0L)
    weights.select(col("bucket").cast("long"), col("weight").cast("long"))
      .collect().foreach(r => lut(r.getLong(0).toInt) = r.getLong(1))
    val scoreCol = aggregate(
      transform(split(col(textCol), " "),
        t => element_at(typedlit(lut.toSeq), (bucket(t, numBuckets) + 1).cast("int"))),
      lit(lut(numBuckets)),
      (acc, w) => acc + w)
    classifyScored(docs, idCol, textCol, scoreCol)
  }
}
