package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING — the step every LLM data
  * pipeline runs before token counting/packing means anything: learn
  * the merge table from the corpus itself (Sennrich et al. 2016).
  *
  * Scale shape — the part that matters at 100 TB:
  *   - The corpus collapses to a WORD-TYPE frequency table first (one
  *     groupBy; map-side combined). All 30-odd merge rounds then run
  *     on |vocab| rows, not |corpus| — the classic trick that makes
  *     BPE training corpus-size-independent after one pass.
  *   - Each round is: adjacent-pair counts (explode bounded by word
  *     length, partial-agg sum), ONE collected row (the argmax pair —
  *     driver traffic is O(1) per round), and a narrow typed map that
  *     rewrites symbol arrays. `localCheckpoint` severs the 30-round
  *     lineage (the Components discipline).
  *   - Ties break on (count DESC, left, right) so training is
  *     deterministic on any cluster layout.
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

  private def initialSyms(word: String): Seq[String] =
    word.map(_.toString) :+ EndOfWord

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

  /** Learn `numMerges` merges from the corpus. Stops early when no
    * adjacent pair remains. Returns merges in rank order.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol).localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val best = words.toDF("syms", "n")
        .filter(size($"syms") >= 2)
        .select($"n", explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"n").as("cnt"))
        .orderBy($"cnt".desc, $"a", $"b")
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      best.headOption match {
        case None => done = true
        case Some((a, b, cnt)) =>
          merges += Merge(rank, a, b, cnt)
          val prev = words
          words = prev
            .map(w => WordSyms(mergePair(w.syms, a, b), w.n))
            .localCheckpoint(true)
          prev.unpersist()
          rank += 1
      }
    }
    words.unpersist()
    merges.result()
  }

  /** Tokenize a single text with a learned merge table. */
  def encodeText(text: String, merges: Seq[Merge]): Seq[String] =
    text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
      var syms = initialSyms(w)
      merges.foreach(m => syms = mergePair(syms, m.left, m.right))
      syms
    }.toSeq

  /** Per-document BPE tokens + token count — a narrow map (the merge
    * table rides the closure; at scale, a broadcast).
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
      .map { case (id, text) =>
        val toks = encodeText(text, ms)
        (id, toks, toks.length.toLong)
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
