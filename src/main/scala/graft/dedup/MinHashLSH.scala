package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection for document corpora —
  * the shingle→minhash→band→bucket-join pipeline.
  *
  * Engine-independent determinism: the base shingle hash is the first 7
  * hex digits of md5 (28 bits), so every permutation `(a·h + b) mod P`
  * stays within exact int64 arithmetic (max a·h < 2^59) — the whole
  * pipeline is reproducible bit-for-bit in any SQL engine, which is what
  * lets the DuckDB oracle verify it.
  *
  * Scale shape: one narrow map to shingles, one shuffle to per-doc
  * signatures (k min-aggregates, map-side combinable), one shuffle on
  * (band, band-signature) for bucketing. Candidate verification touches
  * only bucket-mates — the whole point of LSH — so the pair join never
  * goes quadratic in the corpus.
  */
object MinHashLSH {

  /** Modulus 2^31−1 (prime). */
  val P: Long = 2147483647L

  /** Deterministic permutation coefficients (LCG-spread, fixed seed —
    * Date/random-free for replayability).
    */
  def coefficients(numHashes: Int): Seq[(Long, Long)] =
    (1 to numHashes).map { i =>
      val a = (1103515245L * i + 12345L) % P
      val b = (69069L * i + 1013904223L) % P
      (if (a == 0) 1L else a, b)
    }

  /** 28-bit base hash of a shingle: first 7 hex digits of md5. */
  def shingleHash(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Word k-shingles per document: (id, shingle). Tokenization is
    * materialized as a column first so `split` runs once per row —
    * referencing it inside the higher-order `transform` lambda would
    * re-split per shingle (lambdas block common-subexpression reuse).
    */
  private def shingleBag(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(
        col(idCol),
        explode(
          transform(
            sequence(lit(1), size(col("__toks")) - lit(k - 1)),
            i => array_join(slice(col("__toks"), i, lit(k)), " "))).as("shingle"))

  /** Distinct word k-shingles per document: (id, shingle). The distinct
    * is per-document inside the array (narrow, no shuffle) — NOT a
    * global `.distinct()`, which would add an exchange over the full
    * shingle stream.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(
        col(idCol),
        explode(
          array_distinct(
            transform(
              sequence(lit(1), size(col("__toks")) - lit(k - 1)),
              i => array_join(slice(col("__toks"), i, lit(k)), " ")))).as("shingle"))

  /** MinHash signature per document: `sig_0 … sig_{n-1}` columns, each
    * `min((a_i·h + b_i) mod P)` over the doc's shingles. One shuffle,
    * partial mins map-side.
    */
  def signatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16): DataFrame = {
    // Duplicate shingles cannot change a min — feed the raw bag and skip
    // the per-document distinct entirely (the reference oracle's
    // SELECT DISTINCT is a no-op under MIN for the same reason).
    val sh = shingleBag(docs, idCol, textCol, shingleSize)
      .withColumn("h", shingleHash(col("shingle")))
    val aggs = coefficients(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % P).as(s"sig_$i")
    }
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Candidate near-dup pairs: docs sharing at least one LSH band
    * (consecutive signature slices of `rowsPerBand`), with the signature-
    * estimated Jaccard (fraction of equal components). `numHashes` must
    * be divisible by `rowsPerBand`.
    */
  def candidatePairs(sigIn: DataFrame, idCol: String, numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must be divisible by rowsPerBand")
    // The signature relation is referenced four times below (both sides
    // of the band join + both sides of the signature re-join). No cache:
    // all four references share one identical aggregation subtree, so
    // exchange reuse materializes the shingle→hash→min shuffle ONCE and
    // the other three references read the same shuffle files
    // (ReusedExchange in the physical plan — spec-asserted). A .cache()
    // here had no owner to unpersist it: the result is lazy, so a
    // try/finally would drop the cache before the caller materializes,
    // and leaving it leaked one pinned signature table per call.
    val sig = sigIn
    val numBands = numHashes / rowsPerBand
    val bandCols = (0 until numBands).map { bIdx =>
      struct(
        lit(bIdx).as("band"),
        struct((0 until rowsPerBand)
          .map(r => col(s"sig_${bIdx * rowsPerBand + r}").as(s"v$r")): _*)
          .as("vals"))
    }
    val banded = sig.select(col(idCol), explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.vals").as("vals"))
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("vals"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("vals"))
    val pairs = a.join(b, Seq("band", "vals"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val sigA = sig.select(
      col(idCol).as("id_a") +: (0 until numHashes).map(i => col(s"sig_$i").as(s"a_$i")): _*)
    val sigB = sig.select(
      col(idCol).as("id_b") +: (0 until numHashes).map(i => col(s"sig_$i").as(s"b_$i")): _*)
    val matches = (0 until numHashes)
      .map(i => when(col(s"a_$i") === col(s"b_$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs
      .join(sigA, "id_a")
      .join(sigB, "id_b")
      .select(
        col("id_a"), col("id_b"),
        (matches.cast("double") / numHashes).as("est_jaccard"))
  }
}
