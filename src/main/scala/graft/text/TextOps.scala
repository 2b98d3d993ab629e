package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus pipelines: token statistics,
  * quality scoring, language-ID heuristics, order-sensitive
  * fingerprinting. All pure column derivations (narrow, codegen'd) with
  * exact integer/decimal arithmetic where results feed dedup decisions —
  * reproducible across engines and partitionings.
  */
object TextOps {

  /** Whitespace token count for single-space-separated text (cheap form;
    * see [[graft.functions.Exprs.tokenCount]]).
    */
  def tokenCount(text: Column): Column = graft.functions.Exprs.tokenCount(text)

  /** BPE-ish token estimate: word count plus intra-word punctuation
    * splits — approximates subword segmentation without a vocab.
    */
  def tokenEstimate(text: Column): Column =
    tokenCount(text) +
      (length(text) - length(regexp_replace(text, "[.,;:!?'-]", ""))).cast("long")

  /** C4-segment derivation shared by the t18 batch gate and
    * [[graft.streaming.SegmentDedupStream]] — ONE body, two execution
    * modes, so the streaming twin cannot drift from the oracled batch
    * semantics. Splits each doc into fixed 10-token segments and emits
    * (doc_id, seg_no, seg, h, occ): h is the first-15-hex-chars md5
    * digest as int64, occ packs (doc_id, seg_no) into one orderable
    * int64 for global keep-FIRST. The seg_no < 2^20 packing bound is
    * ENFORCED per row (codegen'd branch) — violation is a task failure,
    * never silent wrong dedup.
    */
  def docSegments(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0L), ceil(size(col("t")) / lit(10.0)).cast("long") - 1),
        i => struct(
          i.as("seg_no"),
          array_join(slice(col("t"), (i * 10 + 1).cast("int"), lit(10)), " ").as("seg"))))
        .as("s"))
      .select(
        col("doc_id"), col("s.seg_no").as("seg_no"), col("s.seg").as("seg"),
        conv(substring(md5(col("s.seg")), 1, 15), 16, 10).cast("long").as("h"),
        when(col("s.seg_no") < 1048576L, col("doc_id") * 1048576L + col("s.seg_no"))
          .otherwise(raise_error(concat(
            lit("t18 occ packing overflow: seg_no >= 1048576 in doc_id "),
            col("doc_id").cast("string")))).as("occ"))

  /** Per-doc re-assembly downstream of segment keep-first: expects the
    * [[docSegments]] frame joined with a nullable `keeper` column (null
    * or ≠ occ ⇒ that occurrence is dropped). State is per-DOC, bounded
    * by len(doc)/10. Null-safe on purpose: the streaming path left-joins
    * its batch-local keepers, so segments whose hash was claimed by an
    * EARLIER micro-batch arrive with keeper null and must count as
    * dropped — the batch path's inner join never produces nulls, making
    * the two modes share this body verbatim.
    */
  def assembleSegmentDedup(joined: DataFrame): DataFrame =
    joined
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("occ") === col("keeper"), 0L).otherwise(1L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(col("occ") === col("keeper"),
              struct(col("seg_no"), col("seg"))))),
            x => x.getField("seg")), " ").as("ctext"))
      .select(
        col("doc_id"), col("n_segs"), col("n_dropped"),
        md5(col("ctext")).as("clean_fp"))

  /** Count of tokens drawn from a stopword list. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(split(text, " "), t => stopwords.map(t === _).reduce(_ || _))).cast("long")

  /** Stopword ratio — the core of the length/stopword quality gate. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordCount(text, stopwords) / tokenCount(text)

  /** Quality gate: minimum length + bounded stopword ratio
    * (1 = passes). Thresholds follow common corpus-filtering practice.
    */
  def qualityFlag(
      text: Column,
      minTokens: Int = 30,
      maxStopRatio: Double = 0.2,
      stopwords: Seq[String] = Seq("the", "a")): Column =
    when(tokenCount(text) >= minTokens &&
      stopwordRatio(text, stopwords) < maxStopRatio, 1L).otherwise(0L)

  /** Language-ID score for one language: fraction of tokens in that
    * language's marker-word list. Scores for several languages → argmax
    * is the classification; here each score is exposed so the decision
    * is auditable.
    */
  def langScore(text: Column, markers: Seq[String]): Column =
    stopwordRatio(text, markers)

  /** Default marker lists (tiny on purpose — the operator shape, not a
    * trained model).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "de", "et"))

  /** Token-budget sequence packing — the batching step between chunked
    * documents and pretraining sequences: concatenate chunks in a
    * stable global order and split at `budget` tokens, so each chunk
    * lands in bin `floor(priorTokens / budget)` at offset
    * `priorTokens mod budget` (concat-then-split semantics; a chunk may
    * straddle its bin boundary and is accounted to the bin where it
    * starts).
    *
    * Scale: the running sum is windowed PER SHARD, not globally — a
    * global ORDER BY window is a single-partition sort, the classic
    * 1000-executor killer; sharding (e.g. `doc_id mod n`) packs shards
    * independently and in parallel, which is how real pipelines shard
    * their training files anyway. Integer arithmetic end-to-end (DIV /
    * mod), so the layout is bit-exact in any engine.
    */
  def packChunks(
      chunks: DataFrame,
      docCol: String,
      idxCol: String,
      tokensCol: String,
      shardCol: String,
      budget: Int): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol))
      .orderBy(col(docCol), col(idxCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    chunks
      .withColumn("__prior", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .select(
        col(docCol), col(idxCol), col(shardCol),
        expr(s"__prior DIV $budget").as("bin"),
        (col("__prior") % budget).as("bin_offset"),
        col(tokensCol))
  }

  /** Repetition / diversity signals — the quality axis that catches
    * degenerate generations and boilerplate (low type–token ratio,
    * one token dominating, repeated bigrams). All pure array
    * expressions: per-row O(distinct·n) worst case, no shuffle, no UDF.
    * Integer comparisons gate the pass flag so the cut is exact in any
    * engine (no double-threshold edge cases).
    */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val n = size(toks).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    // highest single-token frequency, computed without a shuffle:
    // for each distinct token, count its occurrences in the array
    val topCount = array_max(
      transform(array_distinct(toks), t => size(filter(toks, x => x === t)))).cast("long")
    val bigrams = transform(
      sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    val nBigram = size(bigrams).cast("long")
    val nDistinctBigram = size(array_distinct(bigrams)).cast("long")
    docs.select(
      col(idCol),
      n.as("n_tokens"),
      nDistinct.as("n_distinct"),
      round(nDistinct.cast("double") / n, 6).as("distinct_ratio"),
      topCount.as("top_token_count"),
      round((nBigram - nDistinctBigram).cast("double") / nBigram, 6).as("dup_bigram_ratio"),
      // integer-exact gate: distinct/n ≥ 0.3 AND top/n ≤ 0.2
      when(nDistinct * 10 >= n * 3 && topCount * 5 <= n, 1L).otherwise(0L)
        .as("passes_repetition"))
  }

  /** PII patterns for corpus scrubbing (email, NANP phone, US SSN,
    * IPv4) — conservative regexes expressible identically in Java and
    * RE2-style engines (no lookaround), so the scrub is verifiable
    * cross-engine.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "phone" -> "\\b\\d{3}-\\d{3}-\\d{4}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /** Scrub PII from a text column: per-type match counts plus the
    * redacted text (each match → `[TYPE]`). Patterns apply in
    * [[piiPatterns]] order — SSN before phone does not matter (shapes
    * are disjoint) but the order is fixed so results are deterministic.
    * Pure regexp column expressions; at 100 TB this is a narrow map.
    */
  def scrubPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = piiPatterns.map { case (name, pat) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long").as(s"n_$name")
    }
    val scrubbed = piiPatterns.foldLeft(col(textCol)) { case (c, (name, pat)) =>
      regexp_replace(c, pat, s"[${name.toUpperCase}]")
    }
    docs.select(col(idCol) +: counts :+ scrubbed.as("scrubbed") :+
      length(scrubbed).cast("long").as("scrubbed_len"): _*)
  }

  /** CORPUS-LEVEL LINE DEDUPLICATION — the CCNet / Dolma pipeline
    * stage (Wenzek et al. 2020 dedup paragraphs before anything else;
    * Dolma's paragraph dedup is the same keep-first rule through a
    * bloom filter): split every document into `\n` lines, and of all
    * occurrences of each DUPLICATED line across the WHOLE corpus keep
    * only the first (by `(doc_id, line-index)` order) — the cut that
    * kills crawl boilerplate (headers, footers, share bars) which
    * repeats on every page of a site and would otherwise dominate the
    * token distribution. Lines shorter than `minChars` are exempt
    * (always kept): blank lines and short connectives are structure,
    * not boilerplate, and deduplicating them would strip every
    * paragraph break in the corpus — CCNet's length floor.
    *
    * Returns `(idCol, n_lines, n_kept, clean_text)` for EVERY input
    * document (reassembled in original line order; a fully-deduped
    * document comes back empty, not null).
    *
    * 100 TB shape: the census is ONE map-side-combinable
    * `min(struct(id, ln))` per line-DIGEST — `md5` keys the shuffle
    * (16 bytes vs the line text), and a boilerplate line with 10⁹
    * copies folds to one row per partition before the exchange, so
    * there is no hot-key window anywhere (`row_number over
    * partitionBy(line)` would put all copies of the hottest line in
    * one task). Keep-set returns by one `(id, ln)` semi-join;
    * reassembly is a per-document sorted `collect_list` bounded by
    * lines-per-doc, never corpus-wide.
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 minChars: Int): DataFrame = {
    val lines = splitLines(docs, idCol, textCol)
    val big = lines.filter(length(col("line")) >= minChars)
    val kept = lines.filter(length(col("line")) < minChars)
      .unionByName(keepFirstLines(big, idCol))
    reassembleLines(docs, idCol, textCol, kept)
  }

  /** `(idCol, ln, line)` — 0-based line index per document. Shared by
    * the batch operator and the streaming admission twin
    * ([[graft.streaming.LineDedupStream]]) so line boundaries cannot
    * drift between them.
    */
  def splitLines(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("ln", "line")))

  /** Keep-first over `(idCol, ln, line)` rows: of all rows sharing a
    * line (by md5 digest), the one with the smallest `(id, ln)`
    * survives — the map-side-combinable census + semi-join described
    * in [[dedupLines]]'s scaladoc.
    */
  def keepFirstLines(rows: DataFrame, idCol: String): DataFrame = {
    val firsts = rows
      .select(col(idCol), col("ln"), md5(col("line")).as("__h"))
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol).as("id"), col("ln").as("ln"))).as("__f"))
      .select(col("__f.id").as(idCol), col("__f.ln").as("ln"))
    rows.join(firsts, Seq(idCol, "ln"), "left_semi")
  }

  /** The reassembly tail shared by batch and stream: kept lines
    * re-joined in original order, every input document represented
    * (fully-deduped documents come back empty, not null).
    */
  def reassembleLines(docs: DataFrame, idCol: String, textCol: String,
                      kept: DataFrame): DataFrame = {
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      expr("array_join(transform(array_sort(collect_list(struct(ln, line)))," +
        " x -> x.line), '\n')").as("clean_text"))
    docs
      .select(col(idCol),
        size(split(col(textCol), "\n", -1)).cast("long").as("n_lines"))
      .join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Order-SENSITIVE document fingerprint: positional weighted checksum
    * `Σ (i+1)·h(tok_i) mod P` over 28-bit md5-derived token hashes —
    * exact int64 arithmetic (max term ≈ 10^5·2^28 ≪ 2^63), so two
    * documents with the same bag but different order fingerprint
    * differently (unlike md5-of-sorted-tokens), and any SQL engine
    * reproduces it bit-for-bit.
    */
  def positionalFingerprint(text: Column): Column = {
    val P = graft.dedup.MinHashLSH.P
    val terms = transform(
      split(text, " "),
      (tok, i) =>
        (i.cast("long") + 1L) * conv(substring(md5(tok), 1, 7), 16, 10).cast("long") % P)
    aggregate(terms, lit(0L), (acc, t) => (acc + t) % P)
  }

  /** Top-k terms per document by tf·idf with an exact-integer idf
    * surrogate: `score = tf · ((N · 10^6) div df)`. The scaled integer
    * division preserves the idf ordering (monotone in N/df) while
    * keeping every value in exact int64 — `ln` would make the score
    * engine-dependent in the last ulp and break bit-exact verification.
    *
    * Scale shape: one shuffle to (doc, term) counts; document frequency
    * is a second map-side-combinable aggregate over the term key; the
    * per-doc top-k is a bounded window. `nDocs` is passed in (a count
    * the caller typically already has) so the plan stays action-free.
    */
  def tfIdfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nDocs: Long,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df from the tf relation: one row per (doc, term) already → a
    // plain count per term, no countDistinct shuffle needed.
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(df, "term")
      .withColumn("score", col("tf") * expr(s"(${nDocs}000000L div df)"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(idCol), col("term"), col("score"))
  }

  /** Composed corpus-curation pass — the canonical training-data
    * pipeline: exact dedup (keep the min-id canonical per content
    * fingerprint) → quality gate → deterministic hash sample. One
    * shuffle total (the fingerprint window); the quality gate and the
    * sample are narrow filters layered on the same scan, so at 100 TB
    * this is a single exchange over the corpus.
    */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 30,
      maxStopRatio: Double = 0.2,
      samplePct: Int = 50,
      salt: String = "cur1"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("__fp", md5(lower(col(textCol))))
      .withColumn("__canon", min(col(idCol)).over(Window.partitionBy(col("__fp"))))
      .filter(col(idCol) === col("__canon"))
      .filter(qualityFlag(col(textCol), minTokens, maxStopRatio) === 1L)
      .filter(graft.operators.Sampling.bucket(col(idCol), salt) < samplePct)
      .drop("__fp", "__canon")
  }

  /** Token-window chunking for training-data prep: split each document
    * into windows of `chunkTokens` whitespace tokens with `overlap`
    * tokens of context carried between consecutive chunks (stride =
    * chunkTokens − overlap). Pure generator expressions — the tokenize,
    * window arithmetic, and re-join all stay inside whole-stage codegen
    * (no UDF, no shuffle); output grows by ~1/(1−overlap/chunkTokens).
    */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    val toks = split(col(textCol), " ")
    docs
      .withColumn("__toks", toks)
      .withColumn("__start", explode(sequence(lit(1), greatest(size(col("__toks")), lit(1)), lit(step))))
      // a trailing window fully contained in the previous one adds no
      // new tokens — emit only windows that start within the text
      .filter(col("__start") <= size(col("__toks")))
      .select(
        col(idCol),
        expr(s"CAST((__start - 1) DIV $step AS BIGINT)").as("chunk_idx"),
        array_join(slice(col("__toks"), col("__start"), lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens), size(col("__toks")) - col("__start") + 1).cast("long").as("n_tokens"))
  }

  /** Rabin–Karp rolling-hash chunking (content-defined chunking, the
    * dedup-friendly alternative to fixed windows: insertions shift fixed
    * chunk grids but leave most content-defined boundaries in place).
    * Every `rhWindow`-char window is hashed with the polynomial
    * Σ c_j·B^(W−1−j) mod M; positions whose hash ≡ 0 (mod `rhDiv`) are
    * chunk boundaries (expected chunk length ≈ rhDiv chars).
    *
    * The whole computation is Catalyst higher-order functions over a
    * position sequence — codegen'd, narrow, zero shuffle — and the
    * arithmetic is exact int64 (max window sum ≈ 127·31^7·8 ≈ 2.8e13),
    * so any SQL engine replays it bit-for-bit; [[rhWindowSql]] emits the
    * identical polynomial in an engine's own dialect for the oracle.
    */
  val rhWindow = 8
  val rhBase = 31L
  val rhMod = 1000003L
  val rhDiv = 64L
  val rhPowers: IndexedSeq[Long] =
    (0 until rhWindow).scanLeft(1L)((p, _) => p * rhBase).init.toIndexedSeq

  /** The window-hash polynomial at 1-based position `pos`, as SQL text.
    * `chr` renders an engine's char-code-at-position call (Spark:
    * `ascii(substr(text, p, 1))`, DuckDB: `ord(substr(text, p, 1))`).
    */
  def rhWindowSql(pos: String, chr: String => String): String =
    "(" + (0 until rhWindow)
      .map(j => s"${chr(s"$pos + $j")} * ${rhPowers(rhWindow - 1 - j)}")
      .mkString(" + ") + s") % $rhMod"

  /** Per-document boundary profile: window count, boundary count and the
    * positional checksum of the boundary set (order-sensitive — a moved
    * boundary changes the sum), plus the raw hash-stream sum that pins
    * every window hash, not just the boundary subset.
    */
  def rollingHashBoundaries(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // cast: ascii() is int32 and int32·31^5 overflows (ANSI mode throws)
    val chr = (p: String) => s"cast(ascii(substr($textCol, $p, 1)) as bigint)"
    val h = rhWindowSql("i", chr)
    val n7 = s"greatest(length($textCol) - ${rhWindow - 1}, 0)"
    // sequence(1, 0) counts DOWN in Spark — guard the empty case.
    val positions = s"if($n7 < 1, array(), sequence(1, $n7))"
    val boundaries = s"filter($positions, i -> $h % $rhDiv = 0)"
    docs.select(
      col(idCol),
      expr(n7).cast("long").as("n_windows"),
      expr(s"size($boundaries)").cast("long").as("n_boundaries"),
      expr(s"aggregate($boundaries, cast(0 as bigint), (a, i) -> a + i)")
        .as("boundary_sum"),
      expr(s"aggregate($positions, cast(0 as bigint), (a, i) -> a + $h)")
        .as("hash_sum"))
  }

  /** Full per-document profile in one pass. */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      round(langScore(t, markers), 6).as(s"score_$lang")
    }
    docs.select(
      Seq(
        col(idCol),
        tokenCount(t).as("n_tokens"),
        tokenEstimate(t).as("n_tokens_est"),
        round(stopwordRatio(t, Seq("the", "a")), 6).as("stopword_ratio"),
        qualityFlag(t).as("passes_quality"),
        positionalFingerprint(t).as("fingerprint")) ++ scores: _*)
  }
}
