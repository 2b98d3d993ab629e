package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UNIGRAM-LM tokenizer (SentencePiece's model family) — the other
  * real-world subword tokenizer beside BPE (t27–t32): pieces carry
  * log-probabilities and a word's segmentation is the VITERBI-best
  * piece sequence under them; training is hard EM — segment every
  * word type under the current scores (E), recount pieces along the
  * chosen segmentations (M), re-derive scores. This implementation is
  * the deterministic hard-EM variant (SentencePiece's soft
  * forward-backward EM replaced by the argmax E-step), all scoring in
  * integer MICRO-NATS (the house log discipline) with min-piece-length
  * ties, so every round — and therefore the final segmentation of
  * every document — is exact-replayable by the DuckDB oracle.
  *
  * Scale shape: everything runs over the WORD-TYPE table (the t27
  * collapse — corpus scans once, then work is types-sized, not
  * corpus-sized). The Viterbi DP is `maxWordLen` rounds of bounded
  * equi-joins on the word key (candidates per word ≤ maxWordLen ×
  * maxPiece — never quadratic), the M-step recount is one explode +
  * groupBy of the segmentations, and encoding a document is one
  * broadcast-class join from its words to their frozen segmentations.
  * Piece scores live in a joinable table (vocab-bounded), never a
  * literal, so the vocabulary can grow with the corpus.
  */
object UnigramLm {

  private val Sep = ""

  /** Corpus-weighted word types. */
  def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).cast("long").as("freq"))

  /** Micro-nat piece scores from counts: `round(ln(c/total)·10⁶)` with
    * a +1 floor on single chars (coverage: the DP must always have a
    * char path, exactly SentencePiece's required-character rule).
    * Input `(piece, cnt)`; output `(piece, s)`.
    */
  def scoresOf(counts: DataFrame): DataFrame = {
    val smoothed = counts
      .withColumn("c", col("cnt") + when(length(col("piece")) === 1, 1L).otherwise(0L))
      .filter(col("c") > 0)
    val total = smoothed.agg(sum(col("c"))).head().getLong(0)
    smoothed.select(col("piece"),
      round(log(col("c").cast("double") / lit(total.toDouble)) * 1e6)
        .cast("long").as("s"))
  }

  /** Seed counts: corpus-weighted occurrence totals of every substring
    * of length ≤ maxPiece (EM's conventional substring-statistics
    * initialization).
    */
  def seedCounts(words: DataFrame, maxPiece: Int): DataFrame =
    words
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("freq"), col("i"),
        explode(sequence(lit(1), least(lit(maxPiece), col("i")))).as("l"))
      .select(expr("substring(w, i - l + 1, l)").as("piece"), col("freq"))
      .groupBy(col("piece"))
      .agg(sum(col("freq")).cast("long").as("cnt"))

  /** Viterbi-segment every word type under a score table: returns
    * `(w, freq, n_pieces, seg)` — seg the chosen pieces joined by the
    * unit separator, ties at each DP cell broken toward the SHORTEST
    * last piece (then the DP value itself is tie-free since scores
    * are per-piece constants). `maxWordLen` bounds the unrolled DP;
    * longer words fail loudly (production corpora pre-split them —
    * SentencePiece caps sentence/word lengths the same way).
    */
  /** One word's scored candidate for the typed DP: piece of length `l`
    * ending at position `i` with micro-nat score `s`.
    */
  private[text] case class VitCand(i: Int, l: Int, s: Long)
  private[text] case class VitWord(w: String, freq: Long, cs: Seq[VitCand])

  def viterbi(
      words: DataFrame,
      scores: DataFrame,
      maxWordLen: Int,
      maxPiece: Int,
      excludeWholeWord: Boolean = false): (DataFrame, graft.operators.Checkpoints.Token) = {
    val spark = words.sparkSession
    import spark.implicits._
    val tooLong = words.filter(length(col("w")) > maxWordLen).limit(1).count()
    require(tooLong == 0L,
      s"UnigramLm.viterbi: a word exceeds maxWordLen=$maxWordLen — pre-split the corpus")
    // `excludeWholeWord` drops the single piece spanning the entire
    // word (l = len(w) ⇒ i = len(w)) — the prune step's DP, which
    // scores the best segmentation of a piece's own string into
    // STRICTLY SMALLER pieces ([[pruneCounts]]).
    val candBase = words
      .select(col("w"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("i"),
        explode(sequence(lit(1), least(lit(maxPiece), col("i")))).as("l"))
    val candAll = if (excludeWholeWord) candBase.filter(col("l") < length(col("w")))
                  else candBase
    // The WHOLE per-word DP runs in one typed map over each word's
    // collected candidate list (≤ maxWordLen × maxPiece small structs —
    // bounded local work, the selectDiverse discipline), replacing the
    // previous maxWordLen checkpointed join-per-level rounds: one
    // scored-candidate shuffle + one groupBy instead of ~maxWordLen
    // actions (optimization r17, guide §1.2 — measured 139 Spark jobs
    // for the sf0.1 t41 gate, nearly all fixed per-job cost). Scores
    // are integer micro-nats, so best(i) = best(i−l) + s is the same
    // exact long arithmetic the join-per-level rounds did, and the
    // (v desc, l asc) tie-break is replicated verbatim.
    val packed = candAll
      .select(col("w"), col("i"), col("l"),
        expr("substring(w, i - l + 1, l)").as("piece"))
      .join(scores, Seq("piece"))
      .groupBy(col("w"))
      .agg(collect_list(struct(col("i"), col("l"), col("s"))).as("cs"))
    val sepStr = Sep
    val segTyped = words.select(col("w"), col("freq").cast("long").as("freq"))
      .join(packed, Seq("w"), "left_outer")
      .as[VitWord]
      .map { vw =>
        // Spark's string length/substring are codepoint-based — walk
        // codepoints so supplementary characters slice identically.
        val cps = vw.w.codePoints().toArray
        val lenW = cps.length
        val cands = if (vw.cs == null) Seq.empty[VitCand] else vw.cs
        val byI = cands.groupBy(_.i)
        val best = new Array[Long](lenW + 1)
        val bl = new Array[Int](lenW + 1)
        val reached = new Array[Boolean](lenW + 1)
        reached(0) = true
        var i = 1
        var allReached = true
        while (i <= lenW) {
          var bv = 0L; var bestL = 0; var any = false
          byI.getOrElse(i, Nil).foreach { c =>
            if (reached(i - c.l)) {
              val v = best(i - c.l) + c.s
              if (!any || v > bv || (v == bv && c.l < bestL)) {
                bv = v; bestL = c.l; any = true
              }
            }
          }
          if (any) { best(i) = bv; bl(i) = bestL; reached(i) = true }
          else allReached = false
          i += 1
        }
        // COVERAGE GUARD, as loud as the maxWordLen check: a cell no
        // candidate reaches (encode() under a FROZEN score table over a
        // corpus containing characters absent from the vocabulary) must
        // be a per-word error naming the word, never a silent
        // misalignment or a dropped word.
        if (!allReached)
          throw new IllegalStateException(
            "UnigramLm.viterbi: word '" + vw.w + "' has unreachable DP " +
              "cells — a character is not in the vocabulary (frozen " +
              "score table lacks its single-char pieces)")
        val sb = new StringBuilder
        var pos = lenW
        var nPieces = 0L
        while (pos > 0) {
          val l = bl(pos)
          val piece = new String(cps, pos - l, l)
          if (sb.isEmpty) sb.append(piece)
          else sb.insert(0, piece + sepStr)
          nPieces += 1L
          pos -= l
        }
        (vw.w, vw.freq, sb.toString, nPieces)
      }
      .toDF("w", "freq", "seg", "n_pieces")
    val (seg, segTok) = graft.operators.Checkpoints.eager(segTyped)
    (seg, segTok)
  }

  /** Hard-EM M-step: recount pieces along the chosen segmentations.
    * Every single char of the word table rides along with count 0 so
    * the +1 coverage floor in [[scoresOf]] always sees it — a char
    * chosen by NO segmentation must stay in the vocabulary or the
    * next E-step could strand a word with no path.
    */
  def recount(segmented: DataFrame): DataFrame =
    segmented
      .select(explode(split(col("seg"), Sep, -1)).as("piece"),
        col("freq").as("cnt"))
      .unionByName(
        segmented.select(explode(split(col("w"), "")).as("piece"))
          .filter(length(col("piece")) > 0).distinct()
          .select(col("piece"), lit(0L).as("cnt")))
      .groupBy(col("piece"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Train: substring-seeded scores, then `emRounds` hard-EM rounds.
    * Returns the final `(piece, s)` score table.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      maxWordLen: Int,
      maxPiece: Int,
      emRounds: Int): DataFrame = {
    val (words, wTok) = graft.operators.Checkpoints.eager(wordTypes(docs, textCol))
    // every generation of scores is checkpointed BEFORE its inputs are
    // freed — the returned table must not reference freed blocks
    var (sc, scTok) = graft.operators.Checkpoints.eager(
      scoresOf(seedCounts(words, maxPiece)))
    for (_ <- 1 to emRounds) {
      val (seg, segTok) = viterbi(words, sc, maxWordLen, maxPiece)
      val (nsc, nTok) = graft.operators.Checkpoints.eager(
        scoresOf(recount(seg)))
      segTok.free()
      scTok.free()
      sc = nsc
      scTok = nTok
    }
    wTok.free()
    sc
  }

  /** SentencePiece's VOCABULARY-PRUNE step, hard-EM deterministic
    * variant: real SentencePiece seeds a large candidate vocabulary and
    * repeatedly drops the pieces whose removal costs the least
    * likelihood. The loss-delta of removing piece p is approximated —
    * exactly as SentencePiece does — by re-segmenting p's OWN string
    * with the remaining vocabulary: every occurrence of p would fall
    * back to p's best segmentation into STRICTLY SMALLER pieces, so
    *
    *   ld(p) = cnt(p) · (s(p) − altScore(p))   [integer micro-nats]
    *
    * with altScore the Viterbi-best sub-segmentation
    * ([[viterbi]] with `excludeWholeWord = true` — a DP over the
    * VOCABULARY table, ≤ maxPiece levels: types-sized, never
    * corpus-sized). The ⌊pruneFrac·nMulti⌋ multi-char pieces with the
    * SMALLEST loss-delta are dropped (ties → piece ascending); single
    * characters always survive (the coverage rule — every word must
    * keep a path). Returns the kept `(piece, cnt)` counts plus the
    * token of the internal checkpoint (free it after the caller's next
    * checkpoint lands); feed [[scoresOf]] to renormalize.
    *
    * Scale shape: one TakeOrdered top-n over the vocabulary (never a
    * full sort, the r8 discipline), one bounded DP, one broadcast-class
    * score join — nothing touches the corpus.
    */
  def pruneCounts(
      counts: DataFrame,
      scores: DataFrame,
      maxPiece: Int,
      pruneFrac: Double): (DataFrame, graft.operators.Checkpoints.Token) = {
    require(pruneFrac >= 0.0 && pruneFrac < 1.0,
      s"pruneFrac must be in [0, 1), got $pruneFrac")
    val multi = counts.filter(length(col("piece")) >= 2)
    val nMulti = multi.count()
    val nKeep = nMulti - math.floor(nMulti * pruneFrac).toLong
    if (nKeep == nMulti) (counts, graft.operators.Checkpoints.none(counts))
    else {
      val pw = multi.select(col("piece").as("w"), lit(1L).as("freq"))
      val (altSeg, altTok) = viterbi(pw, scores,
        maxWordLen = maxPiece, maxPiece = maxPiece, excludeWholeWord = true)
      // altScore = Σ s over the chosen sub-pieces ≡ the DP's final bval
      val altScore = altSeg
        .select(col("w").as("piece"), explode(split(col("seg"), Sep, -1)).as("p2"))
        .join(scores.select(col("piece").as("p2"), col("s").as("s2")), Seq("p2"))
        .groupBy(col("piece"))
        .agg(sum(col("s2")).as("alt_s"))
      val ld = multi.join(scores, Seq("piece"))
        .join(altScore, Seq("piece"))
        .select(col("piece"), col("cnt"),
          (col("cnt") * (col("s") - col("alt_s"))).as("ld"))
      val keptMulti = ld.orderBy(col("ld").desc, col("piece"))
        .limit(nKeep.toInt)
        .select(col("piece"), col("cnt"))
      (counts.filter(length(col("piece")) === 1).unionByName(keptMulti), altTok)
    }
  }

  /** Train WITH the pruning schedule: substring-seeded scores, then
    * `pruneRounds` rounds of (E: segment → M: recount → rescore →
    * PRUNE the lowest-loss-delta pieces → renormalize). The returned
    * table is the pruned, renormalized vocabulary — gate `t41b` pins
    * it; [[train]] remains the prune-free hard-EM (gate `t41`).
    */
  def trainPruned(
      docs: DataFrame,
      textCol: String,
      maxWordLen: Int,
      maxPiece: Int,
      pruneRounds: Int,
      pruneFrac: Double): DataFrame = {
    val (words, wTok) = graft.operators.Checkpoints.eager(wordTypes(docs, textCol))
    var (sc, scTok) = graft.operators.Checkpoints.eager(
      scoresOf(seedCounts(words, maxPiece)))
    for (_ <- 1 to pruneRounds) {
      val (seg, segTok) = viterbi(words, sc, maxWordLen, maxPiece)
      val (counts, cntTok) = graft.operators.Checkpoints.eager(recount(seg))
      val (sc1, sc1Tok) = graft.operators.Checkpoints.eager(scoresOf(counts))
      val (kept, keptTok) = pruneCounts(counts, sc1, maxPiece, pruneFrac)
      val (nsc, nTok) = graft.operators.Checkpoints.eager(scoresOf(kept))
      // the new generation is checkpointed — every feeder can go
      segTok.free(); cntTok.free(); sc1Tok.free(); keptTok.free(); scTok.free()
      sc = nsc
      scTok = nTok
    }
    wTok.free()
    sc
  }

  /** Encode every document under a frozen score table: per doc the
    * Viterbi segmentation of each word in order, `(doc_id, n_pieces,
    * seg_fp)` with seg_fp the md5 of the full piece stream (words
    * joined by the separator, pieces within a word too — the stream a
    * packer would consume).
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      scores: DataFrame,
      maxWordLen: Int,
      maxPiece: Int): DataFrame = {
    val words = wordTypes(docs, textCol)
    // the returned plan reads the segmentation checkpoint — its token
    // is intentionally not freed here (the context cleaner reclaims it
    // when the result is dropped)
    val seg = viterbi(words, scores, maxWordLen, maxPiece)._1
      .select(col("w"), col("seg"), col("n_pieces"))
    docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("wpos", "w")))
      .filter(length(col("w")) > 0)
      .join(seg, Seq("w"))
      .groupBy(col(idCol))
      .agg(
        sum(col("n_pieces")).cast("long").as("n_pieces"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("wpos"), col("seg")))),
            x => x.getField("seg")),
          Sep)).as("seg_fp"))
  }
}
