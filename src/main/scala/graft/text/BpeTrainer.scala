package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING — the step every LLM data
  * pipeline runs before token counting/packing means anything: learn
  * the merge table from the corpus itself (Sennrich et al. 2016).
  *
  * Scale shape — the part that matters at 100 TB:
  *   - The corpus collapses to a WORD-TYPE frequency table first (one
  *     groupBy; map-side combined). That pass is the only corpus-sized
  *     work; every merge round after it is bounded by |vocab|, not
  *     |corpus| — the classic trick that makes BPE training
  *     corpus-size-independent after one pass.
  *   - [[train]] then runs the merge loop EXECUTOR-LOCAL in a single
  *     job: the word-type table (vocab-bounded — tens of MB even for
  *     web-scale corpora after the type collapse) is shipped to one
  *     partition, and an INCREMENTAL trainer maintains pair counts in
  *     O(Δ) per merge — only the words containing the merged pair are
  *     rewritten, and only the pairs adjacent to a rewrite change
  *     count (a lazy max-heap re-finds the argmax without rescanning).
  *     k merges therefore cost ONE Spark job total, not k jobs — a
  *     50 000-merge production vocabulary is minutes of single-core
  *     work instead of 50 000 sequential job launches + checkpoints.
  *   - [[trainPerRound]] keeps the fully-distributed per-round loop
  *     for the (rare) regime where even the word-TYPE table exceeds a
  *     single executor. It now batches provably-independent merges per
  *     round (strict top-ranked prefix of pairwise-symbol-disjoint
  *     pairs, truncated to counts strictly above the first excluded
  *     pair — see [[planBatch]] for the exactness argument) and
  *     checkpoints every few rounds instead of every merge.
  *   - Ties break on (count DESC, left, right) so training is
  *     deterministic on any cluster layout. Both paths are
  *     merge-for-merge identical to the sequential reference
  *     algorithm (spec-pinned).
  *
  * [[encode]] applies a learned merge table (small, a plain Scala
  * value riding the closure — at scale a broadcast) left-to-right per
  * word — a narrow map, no shuffle.
  */
object BpeTrainer {

  /** End-of-word marker symbol (kept distinct from any char). */
  val EndOfWord = "</w>"

  final case class WordSyms(syms: Seq[String], n: Long)
  final case class Merge(rank: Int, left: String, right: String, cnt: Long)

  /** Greedy left-to-right merge of one (a, b) pair in a symbol array. */
  def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Initial symbols of a word: one symbol per Unicode CODEPOINT (not
    * UTF-16 code unit — `word.map(_.toString)` would split a surrogate
    * pair like an emoji into two broken half-symbols), then the
    * end-of-word marker. Matches DuckDB's `regexp_split_to_array(w,'')`
    * which also splits between codepoints.
    */
  private[text] def initialSyms(word: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EndOfWord
    out.result()
  }

  /** Word-type frequency table → symbol sequences. */
  def wordTable(docs: DataFrame, textCol: String): Dataset[WordSyms] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => WordSyms(initialSyms(w), n) }
  }

  /** The incremental (Sennrich-style) merge loop over an in-memory
    * word-type table. Exact: maintains the same pair counts the
    * round-by-round recount would produce, so with the same
    * (count DESC, left, right) tie-break it emits the identical merge
    * sequence — but each merge costs O(words containing the pair),
    * not O(vocab):
    *   - `pairCount` — current corpus-weighted adjacent-pair counts;
    *   - `pairWords` — inverted index pair → word indices containing
    *     it, so a merge rewrites only the touched words;
    *   - a lazy max-heap over (cnt, left, right): every count change
    *     pushes a fresh entry; popped entries that disagree with
    *     `pairCount` are stale and discarded, so the heap top is
    *     always the true argmax under the determinism rule.
    */
  private[text] def localTrain(
      wordsIn: Iterator[WordSyms], numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val words = mutable.ArrayBuffer.empty[Array[String]]
    val counts = mutable.ArrayBuffer.empty[Long]
    wordsIn.foreach { w => words += w.syms.toArray; counts += w.n }

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // max-heap on count, then LOWEST (left, right) — the trainer's rule
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.by { case (c, a, b) => (c, Reverse(a), Reverse(b)) }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)]

    def addPair(p: (String, String), n: Long, wi: Int): Unit = {
      val c = pairCount.getOrElse(p, 0L) + n
      pairCount(p) = c
      pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
      heap.enqueue((c, p._1, p._2))
    }
    def subPair(p: (String, String), n: Long, wi: Int, stillHas: Boolean): Unit = {
      val c = pairCount(p) - n
      if (c <= 0L) { pairCount.remove(p); pairWords.get(p).foreach(_ -= wi) }
      else {
        pairCount(p) = c
        if (!stillHas) pairWords.get(p).foreach(_ -= wi)
        heap.enqueue((c, p._1, p._2))
      }
    }

    // seed
    var wi = 0
    while (wi < words.length) {
      val s = words(wi); val n = counts(wi)
      var i = 0
      while (i + 1 < s.length) { addPair((s(i), s(i + 1)), n, wi); i += 1 }
      wi += 1
    }

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    while (rank < numMerges && heap.nonEmpty) {
      // pop until a live entry (lazy deletion)
      var top: (Long, String, String) = null
      while (top == null && heap.nonEmpty) {
        val e = heap.dequeue()
        if (pairCount.getOrElse((e._2, e._3), -1L) == e._1) top = e
      }
      if (top == null) { rank = numMerges }
      else {
        val (cnt, a, b) = top
        merges += Merge(rank, a, b, cnt)
        val touched = pairWords.getOrElse((a, b), mutable.Set.empty).toArray
        touched.foreach { ti =>
          val old = words(ti); val n = counts(ti)
          val neu = mergePair(old.toSeq, a, b).toArray
          if (!java.util.Arrays.equals(
              old.asInstanceOf[Array[AnyRef]], neu.asInstanceOf[Array[AnyRef]])) {
            // pair multiset delta for this word
            val delta = mutable.HashMap.empty[(String, String), Long]
            var i = 0
            while (i + 1 < old.length) {
              val p = (old(i), old(i + 1)); delta(p) = delta.getOrElse(p, 0L) - n; i += 1
            }
            i = 0
            while (i + 1 < neu.length) {
              val p = (neu(i), neu(i + 1)); delta(p) = delta.getOrElse(p, 0L) + n; i += 1
            }
            words(ti) = neu
            val neuPairs: Set[(String, String)] =
              neu.indices.dropRight(1).map(i => (neu(i), neu(i + 1))).toSet
            delta.foreach { case (p, d) =>
              if (d > 0L) addPair(p, d, ti)
              else if (d < 0L) subPair(p, -d, ti, stillHas = neuPairs.contains(p))
              else {
                // net-zero count change but membership may persist
                if (neuPairs.contains(p)) pairWords.getOrElseUpdate(p, mutable.Set.empty) += ti
              }
            }
            // words that keep a pair at unchanged count must stay indexed
            neuPairs.foreach(p => if (pairCount.contains(p))
              pairWords.getOrElseUpdate(p, mutable.Set.empty) += ti)
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Reverse-ordering wrapper so the max-heap prefers LOW symbol names. */
  private final case class Reverse(s: String) extends Ordered[Reverse] {
    def compare(that: Reverse): Int = that.s.compareTo(s)
  }

  /** Learn `numMerges` merges from the corpus. Stops early when no
    * adjacent pair remains. Returns merges in rank order.
    *
    * Two-level: the corpus-sized word-type collapse runs distributed;
    * the vocab-bounded merge loop runs executor-local and incremental
    * ([[localTrain]]) in a SINGLE job — driver traffic is the merge
    * table itself, O(numMerges) rows.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = numMerges
    wordTable(docs, textCol)
      .coalesce(1)
      .mapPartitions(it => localTrain(it, k).iterator)
      .collect()
      .toSeq
      .sortBy(_.rank)
  }

  /** One round's provably-independent merge batch from a ranked pair
    * snapshot. Walks the (cnt DESC, a, b) ranking taking a STRICT
    * CONSECUTIVE PREFIX while each pair shares no symbol with — and
    * does not equal the concatenation of — any earlier batch member;
    * then truncates to members with count strictly above the first
    * excluded pair's count (always keeping the top pair).
    *
    * Exactness: counts of symbol-disjoint pairs are invariant under a
    * merge; every pair NOT in the prefix ranks after it, so its
    * (only-decreasing) count stays ≤ the stopper's count; and every
    * pair a merge CREATES is bounded by some overlapping old pair's
    * count, which also ranks after the prefix. The strict-> truncation
    * therefore guarantees each batch member would also have been the
    * sequential argmax at its turn.
    *
    * The argument above needs a stopper count whenever pairs exist
    * BEYOND the snapshot — so the caller must fetch STRICTLY MORE rows
    * than `maxTake` (trainPerRound fetches [[FetchLimit]] = 65 and caps
    * maxTake at 64): if the ranking extends past the window, the
    * `size >= maxTake` guard fires on an in-window row and its count
    * becomes the truncation bound; if the fetch came back short, the
    * snapshot IS the whole ranking and an un-truncated full prefix is
    * exact. Without the extra row, ~64 mutually symbol-disjoint top
    * pairs plus an out-of-window tie could silently diverge from the
    * sequential merge order.
    */
  private[text] def planBatch(
      ranked: Seq[(String, String, Long)], maxTake: Int): Seq[(String, String, Long)] = {
    val batch = Seq.newBuilder[(String, String, Long)]
    var size = 0
    val used = scala.collection.mutable.Set.empty[String]
    val concats = scala.collection.mutable.Set.empty[String]
    var stopCnt = -1L
    val it = ranked.iterator
    var stopped = false
    while (it.hasNext && !stopped) {
      val (a, b, c) = it.next()
      if (size >= maxTake || used(a) || used(b) || concats(a) || concats(b)) {
        stopCnt = c; stopped = true
      } else {
        batch += ((a, b, c)); size += 1
        used += a; used += b; concats += (a + b)
      }
    }
    val all = batch.result()
    if (stopCnt >= 0L && all.length > 1)
      all.head +: all.tail.filter(_._3 > stopCnt)
    else all
  }

  /** Fully-distributed per-round merge loop — the fallback for the
    * regime where even the word-TYPE table is too large for one
    * executor. Per round: one pair-count job collects the top of the
    * ranking, [[planBatch]] extracts every merge that is provably the
    * next sequential argmax, and ONE narrow map applies the whole
    * batch. Lineage is severed every `checkpointEvery` rounds instead
    * of every merge. Merge-for-merge identical to [[train]].
    */
  /** Pair-ranking fetch size per round: one MORE than the largest batch
    * [[planBatch]] may take, so a full-window prefix always sees an
    * in-window stopper whenever pairs exist beyond the window (the
    * exactness precondition documented on [[planBatch]]).
    */
  private[text] val FetchLimit = 65

  def trainPerRound(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      checkpointEvery: Int = 10): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol).localCheckpoint(true)
    // the checkpoint actually holding blocks right now — unpersisted the
    // moment its successor materializes, so at most two checkpoints'
    // blocks ever coexist (the lazy `map` results in between were never
    // persisted and need no release)
    var lastCkpt = words
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var round = 0
    var done = false
    while (rank < numMerges && !done) {
      val ranked = words.toDF("syms", "n")
        .filter(size($"syms") >= 2)
        .select($"n", explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"n").as("cnt"))
        .orderBy($"cnt".desc, $"a", $"b")
        .limit(FetchLimit)
        .as[(String, String, Long)]
        .collect()
        .toSeq
      if (ranked.isEmpty) done = true
      else {
        val batch = planBatch(ranked, maxTake = math.min(numMerges - rank, FetchLimit - 1))
        batch.foreach { case (a, b, c) => merges += Merge(rank, a, b, c); rank += 1 }
        val bs = batch.map { case (a, b, _) => (a, b) }
        words = words.map { w =>
          var s = w.syms
          bs.foreach { case (a, b) => s = mergePair(s, a, b) }
          WordSyms(s, w.n)
        }
        round += 1
        if (round % checkpointEvery == 0) {
          words = words.localCheckpoint(true)
          lastCkpt.unpersist()
          lastCkpt = words
        }
      }
    }
    lastCkpt.unpersist()
    merges.result()
  }

  /** Merge ranks keyed by pair — the encode-side form of the table.
    * Keeps the LOWEST rank per pair (a pair can pathologically be
    * re-learned when a later merge's output collides with an earlier
    * symbol string; first application wins in the sequential order).
    */
  def rankMap(merges: Seq[Merge]): Map[(String, String), Int] =
    merges.groupMapReduce(m => (m.left, m.right))(_.rank)(math.min)

  /** Encode one word by ITERATIVE LOWEST-RANK merging — the standard
    * production encode: repeatedly merge the present pair with the
    * lowest rank (greedy left-to-right across the word) until no
    * adjacent pair is in the table. Cost is O(|word|² · merges
    * APPLIED), independent of vocabulary size — the one-pass
    * rank-order application ([[encodeTextSequential]]) costs O(M) per
    * word, which at a production 50 k-merge table multiplies every
    * corpus-sized encode by 50 000.
    *
    * Equivalence (spec-pinned): ABSENT concat-string collisions,
    * identical to applying every merge once in rank order, because a
    * merge can only CREATE a pair whose rank is higher than its own — a
    * learned pair's constituents are always earlier merges (the pair
    * cannot be counted before its symbols exist), so skipping absent
    * ranks and taking present ones in ascending order visits the same
    * merge sequence. When two distinct merge paths produce the same
    * symbol STRING (e.g. "aab" from both ("aa","b") and ("a","ab") —
    * the case [[rankMap]]'s lowest-rank rule acknowledges), a
    * higher-rank merge can create a pair whose rank the one-pass
    * sequential application already passed, and the two encodes may
    * diverge; the ITERATIVE LOWEST-RANK result is the chosen production
    * semantics (it is what every deployed BPE encoder does), and
    * `BpeTrainerSpec` pins a constructed collision case documenting the
    * divergence.
    */
  private def encodeWord(
      word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = initialSyms(word)
    var done = false
    while (!done && syms.length >= 2) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else syms = mergePair(syms, syms(bi), syms(bi + 1))
    }
    syms
  }

  /** Tokenize a single text with a learned merge table (rank-based
    * encode; cost independent of merge-table size).
    */
  def encodeText(text: String, merges: Seq[Merge]): Seq[String] = {
    val ranks = rankMap(merges)
    text.split(" ").iterator.filter(_.nonEmpty)
      .flatMap(w => encodeWord(w, ranks)).toSeq
  }

  /** The one-pass rank-order application — O(merges) per word; kept as
    * the reference semantics the fast encode is spec-checked against.
    */
  private[text] def encodeTextSequential(text: String, merges: Seq[Merge]): Seq[String] =
    text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
      var syms = initialSyms(w)
      merges.foreach(m => syms = mergePair(syms, m.left, m.right))
      syms
    }.toSeq

  /** Per-document BPE tokens + token count — a narrow map (the merge
    * table rides the closure; at scale, a broadcast). Per-partition
    * WORD-TYPE memoization: natural text re-uses a small type
    * vocabulary constantly, so each partition encodes a given word
    * once and serves repeats from a local map — the same collapse the
    * trainer exploits, applied at encode time.
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val ranks = rankMap(ms)
        val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        rows.map { case (id, text) =>
          val toks = text.split(" ").iterator.filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, ranks)))
            .toSeq
          (id, toks, toks.length.toLong)
        }
      }
      .toDF(idCol, "tokens", "n_bpe_tokens")
  }

  /** Final vocabulary of a merge table over a corpus: distinct symbols
    * after all merges, with corpus frequencies.
    */
  def vocab(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges
    wordTable(docs, textCol)
      .map { w =>
        var syms = w.syms
        ms.foreach(m => syms = mergePair(syms, m.left, m.right))
        WordSyms(syms, w.n)
      }
      .flatMap(w => w.syms.map(_ -> w.n))
      .toDF("symbol", "n")
      .groupBy($"symbol")
      .agg(sum($"n").as("freq"))
  }
}
