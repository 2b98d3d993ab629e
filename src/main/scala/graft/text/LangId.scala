package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-STYLE language identification — the model-shaped LID that
  * replaces `TextOps.langScore`'s marker-word ratio as the default
  * (t5 keeps the marker heuristic for reference parity): hash each
  * boundary-marked character trigram of every word into a bucket,
  * score the document per language with a frozen linear head over the
  * buckets, argmax (ties broken to the lexicographically smallest
  * language, so the decision is deterministic and oracle-replayable).
  * This is the same architecture fastText's lid.176 ships — bag of
  * hashed char n-grams → linear classifier — at trigram-only width.
  *
  * Like [[QualityModel]] (t26), the weights are hash-DERIVED rather
  * than hash-LOADED: `weight_lang(b) = (28-bit md5 prefix of
  * "salt:lang:b") % 201 − 100`. That keeps the gate self-contained
  * while exercising the exact production plan shape — swapping in
  * trained fastText weights is a broadcast join against a
  * (bucket, lang, weight) table and changes nothing structural.
  * Scoring is exact integer arithmetic end-to-end.
  *
  * Scale shape: the trigram-bucket ARRAY is projected once per
  * document (one narrow column — Catalyst does not CSE a repeated
  * split/transform across columns), then each language's score is one
  * codegen'd fold over it — ZERO shuffle, rides the scan, same cost
  * class as the heuristic filters. 100 TB cost = one pass.
  */
object LangId {

  /** The model's language inventory (sorted — tie-break order). */
  val Langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** 28-bit md5-prefix integer — the engine-portable hash standard
    * (MinHashLSH.shingleHash / QualityModel.h28).
    */
  private def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Feature buckets of one document: every char trigram of every
    * boundary-marked word (`<word>` — fastText's markers, so prefixes
    * and suffixes get distinct features), hashed to [0, numBuckets).
    * A word of length n yields exactly n trigrams.
    */
  def bucketArray(textCol: Column, numBuckets: Int): Column =
    flatten(transform(split(textCol, " "), w => {
      val mw = concat(lit("<"), w, lit(">"))
      // length(mw) >= 3 iff the word is non-empty; sequence() with
      // start > stop counts DOWN in Spark, so guard the empty word.
      when(length(w) >= 1,
        transform(sequence(lit(1), length(w)),
          i => h28(mw.substr(i, lit(3))) % numBuckets))
        .otherwise(array().cast("array<bigint>"))
    }))

  /** Frozen per-language weight of a bucket: uniform in [−100, 100]. */
  def weight(b: Column, salt: String, lang: String): Column =
    h28(concat(lit(s"$salt:$lang:"), b.cast("string"))) % 201 - 100

  /** One language's document score: Σ weight over the bucket array. */
  def langScore(buckets: Column, salt: String, lang: String): Column =
    aggregate(buckets, lit(0L), (acc, b) => acc + weight(b, salt, lang))

  /** Per-document language scores + argmax decision:
    * `(idCol, n_grams, s_<lang>..., pred_lang)`.
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               numBuckets: Int, salt: String): DataFrame =
    classifyScored(docs, idCol, textCol, numBuckets,
      l => b => weight(b, salt, l))

  /** [[classify]] with TRAINED weights from a `(bucket, lang, weight)`
    * table instead of the hash derivation — the swap-in path the
    * hash-derived gate exercises structurally. The table is
    * model-sized (`numBuckets · |Langs|` rows — the codebook-collect
    * class), so it rides to every task as one literal lookup array per
    * language and scoring stays the same zero-shuffle codegen'd fold;
    * buckets absent from the table weigh 0. `LangIdSpec` pins this
    * ≡ [[classify]] when fed the hash-derived weights as a table.
    */
  def classifyWithWeights(docs: DataFrame, idCol: String, textCol: String,
                          numBuckets: Int, weights: DataFrame): DataFrame = {
    val luts: Map[String, Array[Long]] = {
      val rows = weights
        .select(col("lang").cast("string"), col("bucket").cast("long"),
          col("weight").cast("long"))
        .collect()
      Langs.map { l =>
        val arr = Array.fill(numBuckets)(0L)
        rows.foreach { r =>
          if (r.getString(0) == l) arr(r.getLong(1).toInt) = r.getLong(2)
        }
        l -> arr
      }.toMap
    }
    classifyScored(docs, idCol, textCol, numBuckets,
      l => b => element_at(typedlit(luts(l).toSeq), (b + 1).cast("int")))
  }

  /** Shared scoring/argmax plan: one projected bucket array, one fold
    * per language with the given per-bucket weight expression, the
    * deterministic argmax chain.
    */
  private def classifyScored(docs: DataFrame, idCol: String, textCol: String,
                             numBuckets: Int,
                             weightOf: String => Column => Column): DataFrame = {
    val withBuckets = docs.select(col(idCol), col(textCol))
      .withColumn("__bk", bucketArray(col(textCol), numBuckets))
    val scored = Langs.foldLeft(withBuckets) { (df, l) =>
      df.withColumn(s"s_$l",
        aggregate(col("__bk"), lit(0L), (acc, b) => acc + weightOf(l)(b)))
    }
    // argmax with ties to the smallest language name: the first
    // language (inventory is sorted) whose score is >= all later ones.
    val pred = Langs.init.foldRight(lit(Langs.last): Column) { (l, rest) =>
      val later = Langs.dropWhile(_ != l).tail
      when(later.map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _), lit(l))
        .otherwise(rest)
    }
    scored
      .select((col(idCol) +: size(col("__bk")).cast("long").as("n_grams") +:
        Langs.map(l => col(s"s_$l"))) :+ pred.as("pred_lang"): _*)
  }
}
