package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed BPE training vs an in-test sequential reference, plus
  * the determinism and round-trip contracts.
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference BPE (the Sennrich et al. algorithm verbatim,
    * on a word-frequency map) — independent of the Spark code paths.
    */
  private def referenceBpe(
      wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String, Long)] = {
    var words: Map[Seq[String], Long] = wordFreq.map { case (w, n) =>
      (w.map(_.toString) :+ BpeTrainer.EndOfWord, n)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var stop = false
    while (i < numMerges && !stop) {
      val counts = collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _ => ()
        }
      }
      if (counts.isEmpty) stop = true
      else {
        // max count, ties on (left, right) ascending — the trainer's rule
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a, b, c))
        words = words.toSeq.map { case (syms, n) =>
          (BpeTrainer.mergePair(syms, a, b), n)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        i += 1
      }
    }
    out.result()
  }

  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower newest newest"),
    (3L, "newest newest newest newest"),
    (4L, "widest widest widest")
  ).toDF("doc_id", "text")

  test("distributed training matches the sequential reference merge-for-merge") {
    val wordFreq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val want = referenceBpe(wordFreq, 12)
    val got = BpeTrainer.train(corpus, "text", 12)
      .map(m => (m.left, m.right, m.cnt))
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(got.length == 12)
  }

  test("per-round distributed fallback matches the same sequence (batched rounds)") {
    val wordFreq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val want = referenceBpe(wordFreq, 12)
    val got = BpeTrainer.trainPerRound(corpus, "text", 12, checkpointEvery = 3)
      .map(m => (m.left, m.right, m.cnt))
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("both paths agree with the reference on the real corpus, 40 merges") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val wordFreq = docs.select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0).groupBy($"w").count()
      .as[(String, Long)].collect().toMap
    val want = referenceBpe(wordFreq, 40)
    val inc = BpeTrainer.train(docs, "text", 40).map(m => (m.left, m.right, m.cnt))
    val per = BpeTrainer.trainPerRound(docs, "text", 40).map(m => (m.left, m.right, m.cnt))
    assert(inc == want)
    assert(per == want)
  }

  test("non-BMP text splits on codepoints, not UTF-16 units") {
    // U+1F600 GRINNING FACE is a surrogate pair in UTF-16; a code-unit
    // split would produce two broken half-symbols that can never
    // round-trip. Each emoji must be ONE initial symbol.
    val emoji = new String(Character.toChars(0x1F600))
    val txt = s"$emoji$emoji a $emoji a"
    val docs = Seq((1L, txt)).toDF("doc_id", "text")
    val wordFreq = Map(s"$emoji$emoji" -> 1L, "a" -> 2L, emoji -> 1L)
    val want = referenceBpeCodepoints(wordFreq, 3)
    val got = BpeTrainer.train(docs, "text", 3).map(m => (m.left, m.right, m.cnt))
    assert(got == want, s"\ngot  $got\nwant $want")
    // every learned symbol is a well-formed codepoint sequence — a
    // UTF-16 code-unit split would put a lone surrogate on each side
    def wellFormed(s: String): Boolean = {
      var i = 0
      while (i < s.length) {
        if (Character.isHighSurrogate(s.charAt(i))) {
          if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1))) return false
          i += 2
        } else if (Character.isLowSurrogate(s.charAt(i))) return false
        else i += 1
      }
      true
    }
    got.foreach { case (l, r, _) =>
      assert(wellFormed(l) && wellFormed(r), s"broken surrogate in merge ($l, $r)")
    }
    val enc = BpeTrainer.encode(docs, "doc_id", "text", BpeTrainer.train(docs, "text", 3))
    val toks = enc.select($"tokens").as[Seq[String]].head()
    assert(toks.mkString("").replace(BpeTrainer.EndOfWord, " ").trim == txt)
  }

  /** Codepoint-splitting variant of the reference (for non-BMP input). */
  private def referenceBpeCodepoints(
      wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String, Long)] = {
    def cps(w: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp)); i += Character.charCount(cp)
      }
      out.result()
    }
    var words: Map[Seq[String], Long] = wordFreq.map { case (w, n) =>
      (cps(w) :+ BpeTrainer.EndOfWord, n)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var stop = false
    while (i < numMerges && !stop) {
      val counts = collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _ => ()
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a, b, c))
        words = words.toSeq.map { case (syms, n) =>
          (BpeTrainer.mergePair(syms, a, b), n)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        i += 1
      }
    }
    out.result()
  }

  test("rank-based encode equals the one-pass sequential application everywhere") {
    // real corpus, full 100-merge table
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = BpeTrainer.train(docs, "text", 100)
    val texts = docs.select($"text").as[String].collect()
    texts.foreach { t =>
      assert(BpeTrainer.encodeText(t, merges) ==
        BpeTrainer.encodeTextSequential(t, merges), s"diverged on: ${t.take(60)}")
    }
    // adversarial overlap shapes: runs of one symbol, nested merges
    val tricky = Seq((1L, "aaaa aaa aa a aaaaa"), (2L, "ababab abab ab"),
      (3L, "xyxy xy x y yx"))
    val df = tricky.toDF("doc_id", "text")
    val m2 = BpeTrainer.train(df, "text", 12)
    tricky.foreach { case (_, t) =>
      assert(BpeTrainer.encodeText(t, m2) ==
        BpeTrainer.encodeTextSequential(t, m2), s"diverged on: $t")
    }
    // encode() (memoized partition path) agrees with encodeText
    val enc = BpeTrainer.encode(df, "doc_id", "text", m2)
      .select($"doc_id", $"tokens").as[(Long, Seq[String])].collect().toMap
    tricky.foreach { case (id, t) =>
      assert(enc(id) == BpeTrainer.encodeText(t, m2))
    }
  }

  test("planBatch truncates a full-window prefix against the first out-of-window count") {
    // 64 mutually symbol-disjoint top pairs, then a 65th whose count TIES
    // the 64th: with the old 64-row fetch the window held no stopper and
    // the whole prefix shipped, letting the tied out-of-window pair (which
    // wins the (left, right) tie-break) silently diverge from the
    // sequential order. The 65-row fetch makes row 65 the stopper, so
    // members at its count are truncated away.
    val ranked: Seq[(String, String, Long)] =
      (0 until 64).map(i => (s"a$i", s"b$i", (200 - i).toLong)) :+ (("z", "zz", 137L))
    assert(ranked.length == BpeTrainer.FetchLimit)
    val got = BpeTrainer.planBatch(ranked, maxTake = BpeTrainer.FetchLimit - 1)
    assert(got == ranked.take(63), s"got ${got.length} members")
    assert(got.forall(_._3 > 137L))
    // short fetch = the whole ranking is in view: a full prefix is exact
    // and must NOT be truncated
    val short = ranked.take(10)
    assert(BpeTrainer.planBatch(short, maxTake = 64) == short)
  }

  test("concat-string collision: iterative lowest-rank encode is the chosen semantics") {
    // "abc" is producible two ways — ("a","bc") at rank 2 and ("ab","c")
    // at rank 4 — so rank 4 can CREATE the pair ("d","abc") whose rank 3
    // the one-pass sequential application has already passed. The two
    // encodes legitimately diverge here; production semantics is the
    // iterative lowest-rank result (what every deployed BPE encoder
    // computes), as documented on encodeWord.
    import BpeTrainer.Merge
    val ms = Seq(
      Merge(0, "a", "b", 9L), Merge(1, "b", "c", 8L), Merge(2, "a", "bc", 7L),
      Merge(3, "d", "abc", 6L), Merge(4, "ab", "c", 5L))
    assert(BpeTrainer.encodeText("dabc", ms) ==
      Seq("dabc", BpeTrainer.EndOfWord))
    assert(BpeTrainer.encodeTextSequential("dabc", ms) ==
      Seq("d", "abc", BpeTrainer.EndOfWord))
  }

  test("a 100-merge train costs O(1) Spark jobs, not O(merges)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.count() // warm the scan outside the measured window
    spark.sparkContext.addSparkListener(listener)
    try {
      val merges = BpeTrainer.train(docs, "text", 100)
      Thread.sleep(500) // let queued listener events drain
      assert(merges.length == 100)
      // the old loop was 2 jobs per merge (argmax collect + eager
      // checkpoint) = 200; the incremental path is the word-table
      // collapse + one local merge loop — a handful of jobs end to end
      assert(jobs.get() <= 10, s"expected O(1) jobs, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("training is deterministic and encode round-trips the text") {
    val m1 = BpeTrainer.train(corpus, "text", 8)
    val m2 = BpeTrainer.train(corpus, "text", 8)
    assert(m1 == m2)
    val enc = BpeTrainer.encode(corpus, "doc_id", "text", m1)
    // concatenating a doc's tokens and stripping markers rebuilds the text
    val rows = enc.select($"doc_id", $"tokens").as[(Long, Seq[String])].collect()
    val orig = corpus.as[(Long, String)].collect().toMap
    rows.foreach { case (id, toks) =>
      val rebuilt = toks.mkString("")
        .replace(BpeTrainer.EndOfWord, " ").trim
      assert(rebuilt == orig(id), s"doc $id")
    }
    // merged symbols actually compress: fewer BPE tokens than chars
    val nTok = enc.select(sum($"n_bpe_tokens")).as[Long].head()
    val nChar = corpus.select(sum(length($"text"))).as[Long].head()
    assert(nTok < nChar)
  }

  test("trains on the real documents table and encodes it") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val merges = BpeTrainer.train(docs, "text", 10)
    assert(merges.length == 10)
    // counts must be non-increasing-ish sanity: every merge was the max
    // of its round, and all counts are positive
    assert(merges.forall(_.cnt > 0))
    val enc = BpeTrainer.encode(docs, "doc_id", "text", merges)
    assert(enc.count() == docs.count())
    val v = BpeTrainer.vocab(docs, "text", merges)
    // every learned merge's joined symbol exists in the final vocab
    val symbols = v.select($"symbol").as[String].collect().toSet
    merges.foreach(m => assert(symbols.contains(m.left + m.right) ||
      // unless a later merge consumed it entirely
      merges.exists(later => later.rank > m.rank &&
        (later.left == m.left + m.right || later.right == m.left + m.right))))
  }
}
