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
