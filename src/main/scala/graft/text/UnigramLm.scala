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
  def viterbi(
      words: DataFrame,
      scores: DataFrame,
      maxWordLen: Int,
      maxPiece: Int,
      excludeWholeWord: Boolean = false): (DataFrame, graft.operators.Checkpoints.Token) = {
    val tooLong = words.filter(length(col("w")) > maxWordLen).limit(1).count()
    require(tooLong == 0L,
      s"UnigramLm.viterbi: a word exceeds maxWordLen=$maxWordLen — pre-split the corpus")
    // The scored candidates feed every DP level — checkpoint ONCE, and
    // checkpoint each level too: level i's plan references the prior
    // maxPiece levels, so unsevered lineage would re-evaluate the
    // candidate join a Fibonacci-growing number of times (measured
    // 177 s for the sf0.1 encode before severing; ~4 s after).
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
    val (cand, candTok) = graft.operators.Checkpoints.eager(candAll
      .select(col("w"), col("i"), col("l"),
        expr("substring(w, i - l + 1, l)").as("piece"))
      .join(scores, Seq("piece"))
      .select(col("w"), col("i"), col("l"), col("s")))
    // DP forward: best(w, 0) = 0; best(w, i) = max over l of
    // best(w, i-l) + s, tie -> min l (recorded as bl for backtracking)
    var best = words.select(col("w"), lit(0).as("pos"),
      lit(0L).as("bval"), lit(0).as("bl"))
    val levelToks = scala.collection.mutable.ArrayBuffer
      .empty[graft.operators.Checkpoints.Token]
    for (i <- 1 to maxWordLen) {
      val prev = best.select(col("w").as("pw"), col("pos").as("ppos"),
        col("bval").as("pval"))
      val step = cand.filter(col("i") === i)
        .join(prev, col("w") === col("pw") && col("ppos") === col("i") - col("l"))
        .select(col("w"), col("i").as("pos"),
          (col("pval") + col("s")).as("v"), col("l"))
      val win = Window.partitionBy(col("w")).orderBy(col("v").desc, col("l"))
      val (bi, biTok) = graft.operators.Checkpoints.eager(
        step.withColumn("r", row_number().over(win))
          .filter(col("r") === 1)
          .select(col("w"), col("pos"), col("v").as("bval"), col("l").as("bl")))
      levelToks += biTok
      best = best.unionByName(bi)
    }
    // backtrack: bl per position as a dense array, then one bounded
    // fold reconstructs the piece sequence (maxWordLen iterations)
    val blArr = best.filter(col("pos") > 0)
      .groupBy(col("w"))
      .agg(array_sort(collect_list(struct(col("pos"), col("bl")))).as("pb"))
      .select(col("w"), transform(col("pb"), x => x.getField("bl")).as("bls"))
    val walk = aggregate(
      sequence(lit(1), lit(maxWordLen)),
      struct(length(col("w")).as("pos"), lit("").as("seg")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val l = element_at(col("bls"), pos.cast("int"))
        val piece = col("w").substr(pos - l + 1, l)
        val seg0 = acc.getField("seg")
        val seg = when(seg0 === "", piece).otherwise(concat(piece, lit(Sep), seg0))
        when(pos > 0, struct((pos - l).as("pos"), seg.as("seg"))).otherwise(acc)
      })
    // COVERAGE GUARD, as loud as the maxWordLen check: the walk indexes
    // `bls` by absolute position, so it is only correct when EVERY cell
    // 1..len(w) was reached. An unreachable cell (encode() under a
    // FROZEN score table over a corpus containing characters absent
    // from the vocabulary) would leave the array short — positions
    // misalign and segmentations go silently wrong — or drop the word
    // entirely through an inner join. Left-join + raise_error makes
    // both failure modes a per-word error naming the word.
    val covered = words.join(blArr, Seq("w"), "left_outer")
      .select(col("w"), col("freq"),
        when(size(col("bls")) === length(col("w")), col("bls"))
          .otherwise(raise_error(concat(
            lit("UnigramLm.viterbi: word '"), col("w"),
            lit("' has unreachable DP cells — a character is not in the "),
            lit("vocabulary (frozen score table lacks its single-char pieces)"))))
          .as("bls"))
    val (seg, segTok) = graft.operators.Checkpoints.eager(
      covered
        .select(col("w"), col("freq"), walk.getField("seg").as("seg"))
        .select(col("w"), col("freq"), col("seg"),
          (size(split(col("seg"), Sep, -1))).cast("long").as("n_pieces")))
    candTok.free()
    levelToks.foreach(_.free())
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
