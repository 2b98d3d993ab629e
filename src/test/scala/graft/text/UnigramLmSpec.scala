package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[UnigramLm]] — the SentencePiece-family tokenizer (hard-EM unigram
  * LM): Viterbi DP correctness on hand vocabularies, the min-length
  * tie-break, and the full train→encode chain pinned bit-for-bit
  * against a local Scala replay of the identical integer arithmetic
  * over the sf0.001 corpus.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val SepCh = ''

  test("viterbi picks the higher-probability segmentation") {
    val words = Seq(("abab", 1L)).toDF("w", "freq")
    val scores = Seq(("a", -10L), ("b", -10L), ("ab", -15L)).toDF("piece", "s")
    val out = UnigramLm.viterbi(words, scores, maxWordLen = 8, maxPiece = 4)._1
      .select($"seg", $"n_pieces").as[(String, Long)].head()
    assert(out == (s"ab${SepCh}ab", 2L))
  }

  test("DP cell ties break toward the shortest last piece") {
    // "ab" via a|b = -20, via ab = -20: tie at the final cell — the
    // l ASC tie-break picks l=1, i.e. a|b
    val words = Seq(("ab", 1L)).toDF("w", "freq")
    val scores = Seq(("a", -10L), ("b", -10L), ("ab", -20L)).toDF("piece", "s")
    val out = UnigramLm.viterbi(words, scores, maxWordLen = 8, maxPiece = 4)._1
      .select($"seg").as[String].head()
    assert(out == s"a${SepCh}b")
  }

  test("words longer than maxWordLen fail loudly") {
    val words = Seq(("abcdefghij", 1L)).toDF("w", "freq")
    val scores = Seq(("a", -1L)).toDF("piece", "s")
    intercept[IllegalArgumentException] {
      UnigramLm.viterbi(words, scores, maxWordLen = 8, maxPiece = 4)
    }
  }

  test("a character absent from the frozen vocabulary fails loudly, not silently") {
    // encode() with a FROZEN score table over a corpus containing a new
    // character: DP cells after that character are unreachable, so the
    // backtrack array is short — positions would misalign (silently
    // wrong segmentation) or the word would vanish through an inner
    // join. The coverage guard must turn both into a named error.
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // fully unreachable word ("xy" shares no character with the vocab)
    val scores = Seq(("a", -10L), ("b", -10L), ("ab", -15L)).toDF("piece", "s")
    val e1 = intercept[Exception] {
      UnigramLm.viterbi(Seq(("xy", 1L)).toDF("w", "freq"), scores, 8, 4)
        ._1.collect()
    }
    assert(messages(e1).exists(_.contains("unreachable DP cells")),
      s"expected the coverage guard, got: ${e1.getMessage}")
    // PARTIALLY reachable word ("abx": cells 1-2 fine, cell 3 has no
    // piece) — the misalignment case the guard exists for
    val e2 = intercept[Exception] {
      UnigramLm.viterbi(Seq(("abx", 1L)).toDF("w", "freq"), scores, 8, 4)
        ._1.collect()
    }
    assert(messages(e2).exists(_.contains("unreachable DP cells")),
      s"expected the coverage guard, got: ${e2.getMessage}")
    // end-to-end: encode under a frozen table over an unseen character
    val docs0 = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val trained = UnigramLm.train(docs0, "text", 8, 4, 1)
    val e3 = intercept[Exception] {
      UnigramLm.encode(Seq((2L, "ab zq")).toDF("doc_id", "text"),
        "doc_id", "text", trained, 8, 4).collect()
    }
    assert(messages(e3).exists(_.contains("unreachable DP cells")))
  }

  test("pruneCounts drops the smallest loss-delta pieces — hand-checked") {
    // scores: a=-10, b=-20, ab=-25, ba=-28 (micro-nats)
    //   alt(ab) = s(a)+s(b) = -30  → ld(ab) = 4·(-25 − (-30)) = 20
    //   alt(ba) = s(b)+s(a) = -30  → ld(ba) = 2·(-28 − (-30)) =  4
    // frac 0.5 over 2 multi pieces → prune 1: "ba" (smaller ld) drops,
    // "ab" survives, single chars always survive
    val counts = Seq(("a", 5L), ("b", 3L), ("ab", 4L), ("ba", 2L))
      .toDF("piece", "cnt")
    val scores = Seq(("a", -10L), ("b", -20L), ("ab", -25L), ("ba", -28L))
      .toDF("piece", "s")
    val (kept, tok) = UnigramLm.pruneCounts(counts, scores, maxPiece = 4,
      pruneFrac = 0.5)
    val got = kept.as[(String, Long)].collect().toSet
    tok.free()
    assert(got == Set(("a", 5L), ("b", 3L), ("ab", 4L)), s"got $got")
    // frac 0 is the identity
    val (all, tok0) = UnigramLm.pruneCounts(counts, scores, 4, 0.0)
    assert(all.as[(String, Long)].collect().toSet ==
      counts.as[(String, Long)].collect().toSet)
    tok0.free()
    // a loss-delta TIE breaks toward the lexicographically smaller piece
    // (both ld = 0 when the piece scores exactly its sub-segmentation)
    val tieC = Seq(("a", 1L), ("b", 1L), ("ab", 1L), ("ba", 1L)).toDF("piece", "cnt")
    val tieS = Seq(("a", -10L), ("b", -10L), ("ab", -20L), ("ba", -20L))
      .toDF("piece", "s")
    val (tk, tokT) = UnigramLm.pruneCounts(tieC, tieS, 4, 0.5)
    val gotT = tk.as[(String, Long)].collect().toSet
    tokT.free()
    assert(gotT == Set(("a", 1L), ("b", 1L), ("ab", 1L)),
      s"tie must keep 'ab' (piece ASC), got $gotT")
  }

  // ---- local replay of the identical integer arithmetic -------------

  private def refScores(counts: Map[String, Long]): Map[String, Long] = {
    val sm = counts.map { case (p, c) => p -> (c + (if (p.length == 1) 1L else 0L)) }
      .filter(_._2 > 0)
    val total = sm.values.sum
    sm.map { case (p, c) => p -> math.round(math.log(c.toDouble / total.toDouble) * 1e6) }
  }

  private def refViterbi(w: String, s: Map[String, Long], maxPiece: Int): Seq[String] = {
    val n = w.length
    val bval = Array.fill(n + 1)(Long.MinValue); bval(0) = 0L
    val bl = Array.fill(n + 1)(0)
    for (i <- 1 to n) {
      var bestV = Long.MinValue; var bestL = 0
      for (l <- 1 to math.min(maxPiece, i)) {
        val piece = w.substring(i - l, i)
        s.get(piece).foreach { sc =>
          val v = bval(i - l) + sc
          if (v > bestV || (v == bestV && (bestL == 0 || l < bestL))) {
            bestV = v; bestL = l
          }
        }
      }
      bval(i) = bestV; bl(i) = bestL
    }
    var pos = n
    var acc = List.empty[String]
    while (pos > 0) { val l = bl(pos); acc = w.substring(pos - l, pos) :: acc; pos -= l }
    acc
  }

  test("train + encode equals the local hard-EM replay on sf0.001") {
    val maxPiece = 4
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")

    // --- local replay ------------------------------------------------
    val docRows = docs.as[(Long, String)].collect().toSeq
    val words = docRows.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val seed = words.toSeq.flatMap { case (w, f) =>
      for (i <- 1 to w.length; l <- 1 to math.min(maxPiece, i))
        yield (w.substring(i - l, i), f)
    }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    var sc = refScores(seed)
    // one hard-EM round: segment every word type, recount (+0 rows for
    // every single char so the coverage floor sees them)
    val segs = words.map { case (w, f) => w -> refViterbi(w, sc, maxPiece) }
    val rec0 = segs.toSeq.flatMap { case (w, pieces) =>
      pieces.map(p => (p, words(w)))
    }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val chars = words.keys.flatMap(_.toCharArray.map(_.toString)).toSet
    val rec = rec0 ++ chars.filterNot(rec0.contains).map(_ -> 0L)
    sc = refScores(rec)
    val finalSeg = words.map { case (w, _) => w -> refViterbi(w, sc, maxPiece) }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wantRows = docRows.map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val stream = ws.map(w => finalSeg(w).mkString(SepCh.toString))
        .mkString(SepCh.toString)
      id -> ((ws.map(w => finalSeg(w).size.toLong).sum, md5hex(stream)))
    }.toMap

    // --- engine ------------------------------------------------------
    val trained = UnigramLm.train(docs, "text", maxWordLen = 8,
      maxPiece = maxPiece, emRounds = 1)
    val got = UnigramLm.encode(docs, "doc_id", "text", trained, 8, maxPiece)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == wantRows.keySet)
    wantRows.foreach { case (id, (np, fp)) =>
      assert(got(id) == ((np, fp)), s"doc $id diverged: got ${got(id)} want ($np,$fp)")
    }
  }

  test("train is deterministic under repartitioning") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").limit(80)
    val a = UnigramLm.train(docs, "text", 8, 4, 1)
      .orderBy($"piece").as[(String, Long)].collect().toSeq
    val b = UnigramLm.train(docs.repartition(7), "text", 8, 4, 1)
      .orderBy($"piece").as[(String, Long)].collect().toSeq
    assert(a == b)
  }
}
