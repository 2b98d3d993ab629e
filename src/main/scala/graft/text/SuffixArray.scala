package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** DISTRIBUTED SUFFIX ARRAY by prefix doubling — the data structure
  * behind exact-substring deduplication (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better", builds one over the
  * whole training corpus; t15/t17's k-gram spans approximate what the
  * SA computes exactly). The corpus is modeled as the single string
  * `doc₀ ⊕ SEP ⊕ doc₁ ⊕ SEP ⊕ … ⊕ SEP` (docs in `doc_id` order,
  * SEP = U+0001, below every text codepoint, one TRAILING separator so
  * each document is fenced) without ever materializing it: each
  * codepoint is a row `(gid, code)` where `gid` is its 1-based global
  * position, and document offsets come from one two-pass prefix sum
  * over the |docs|-granular length relation.
  *
  * Prefix doubling (Manber–Myers): `rank₀` orders positions by their
  * first codepoint; each round joins every position's rank with the
  * rank `step` positions ahead (missing → −1, the shorter-suffix-first
  * convention that equals lexicographic order) and re-ranks by the
  * pair. After the round for step `s`, equal ranks ⇔ equal first `2s`
  * codepoints; the loop stops when every rank is distinct (all group
  * counts = 1), which for natural text happens at `2s` ≈ the longest
  * repeated substring, NOT at corpus length. The final ranks are the
  * suffix array: `sa_rank = r` means the suffix starting at that
  * position is the r-th smallest.
  *
  * Spark shape — this operator is WHY `operators/GlobalRank` exists:
  * every round is (a) one id-keyed self-join (`gid + step`), (b) one
  * map-side-combinable group count of the pair relation (also the
  * convergence test), (c) one two-pass rank of the DISTINCT pairs
  * (range shuffle of ≤ n tiny rows, broadcast offsets — never a
  * single-partition sort), (d) one join-back. Each round's rank table
  * is eagerly `localCheckpoint`ed and its predecessor unpersisted —
  * the iterated-lineage discipline (PLANS.md round-12 gotcha).
  * O(log(longest-repeat)) rounds of linear shuffles: the shape that
  * survives 1000 executors, vs. the sequential DC3/SA-IS builds that
  * assume one machine.
  */
object SuffixArray {

  /** Separator codepoint — strictly below any text codepoint. */
  val Sep = 1

  private def parts(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** `(doc_id, pos, code, n_cp)` — 1-based CODEPOINT positions (never
    * UTF-16 units: surrogate pairs are one position, matching DuckDB /
    * SQL `length`/`substr` semantics) plus the per-doc codepoint count.
    */
  private def charRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = if (text == null) "" else text
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
        var i = 0
        var pos = 1L
        while (i < t.length) {
          val cp = t.codePointAt(i)
          out += ((id, pos, cp))
          i += Character.charCount(cp)
          pos += 1
        }
        val n = pos - 1
        out.map { case (d, p, c) => (d, p, c, n) }
      }
      .toDF(idCol, "pos", "code", "n_cp")
  }

  /** Global addressing: `(doc_id, pos, gid, code)` for every text
    * codepoint plus one SEP row per document at `pos = n_cp + 1`.
    * Offsets ride [[graft.operators.GlobalRank.withGlobalPrefixSum]]
    * over the |docs|-granular length relation.
    */
  private def addressed(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = charRows(docs, idCol, textCol)
    // include empty docs: they still contribute their SEP row
    val lens = docs.select(col(idCol).cast("long"))
      .join(chars.groupBy(col(idCol)).agg(max(col("n_cp")).as("n_cp")), Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("n_cp"), lit(0L)).as("n_cp"))
    val offs = graft.operators.GlobalRank
      .withGlobalPrefixSum(lens, "cum", col("n_cp") + 1, parts(lens), col(idCol))
      .select(col(idCol), (col("cum") - col("n_cp") - 1).as("off"), col("n_cp"))
    val text = chars.join(offs.select(col(idCol), col("off")), Seq(idCol))
      .select(col(idCol), col("pos"), (col("off") + col("pos")).as("gid"), col("code"))
    val seps = offs.select(col(idCol), (col("n_cp") + 1).as("pos"),
      (col("off") + col("n_cp") + 1).as("gid"), lit(Sep).as("code"))
    text.unionByName(seps)
  }

  /** One doubling round: rank by (rank, rank at +step), dense via a
    * two-pass rank of the distinct pairs. Returns the new `(gid, rank)`
    * table, whether any rank is still shared (distinct pairs < total —
    * read for free from the rank's own pass-1 count, no extra action),
    * and the round's checkpointed pair table for the caller to
    * unpersist once the new rank table materializes.
    */
  private def doubleOnce(cur: DataFrame, step: Long, total: Long,
                         nParts: Int): (DataFrame, Boolean, DataFrame) = {
    // checkpoint: consumed twice (distinct + join-back) and derived
    // from a self-join — an unsevered lineage would run it twice
    val pairs = cur.as("a")
      .join(cur.as("b"), col("b.gid") === col("a.gid") + step, "left_outer")
      .select(col("a.gid").as("gid"), col("a.rank").as("r1"),
        coalesce(col("b.rank"), lit(-1L)).as("r2"))
      .localCheckpoint(true)
    val (ranked, nDistinct) = graft.operators.GlobalRank
      .withGlobalRankCounted(pairs.select(col("r1"), col("r2")).distinct(),
        "__nr", nParts, col("r1"), col("r2"))
    (pairs.join(ranked, Seq("r1", "r2")).select(col("gid"), col("__nr").as("rank")),
      nDistinct < total, pairs)
  }

  /** Range partitions sized to the corpus: the per-round relations are
    * one row per codepoint, so small slices should not pay 32-way
    * shuffle overhead (AQE coalesces the framework shuffles; this
    * right-sizes the explicit two-pass range partitioning).
    */
  private def rankParts(df: DataFrame, n: Long): Int =
    math.max(1, math.min(parts(df), (n / 50000L).toInt + 1))

  /** The suffix array: `(doc_id, pos, gid, sa_rank)` for every TEXT
    * position (SEP positions participate in the build — they fence
    * documents — but are filtered from the output). `sa_rank` is the
    * 1-based lexicographic rank of the suffix of the SEP-joined corpus
    * string starting at `gid`, over ALL positions including the SEPs
    * (deterministic; the oracle replays the same enumeration).
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
            maxRounds: Int = 40): DataFrame = {
    val addr = addressed(docs, idCol, textCol).localCheckpoint(true)
    val total = addr.count()
    val np = rankParts(addr, total)
    var cur = addr.select(col("gid"), col("code").cast("long").as("rank"))
      .localCheckpoint(true)
    var last = cur
    var step = 1L
    var rounds = 0
    var ties = true
    // rank0 groups by ONE codepoint; the loop is provably finite
    // (ranks strictly refine and suffix lengths are all distinct) —
    // maxRounds is a runaway backstop (2^40 >> any corpus).
    while (ties && rounds < maxRounds) {
      val (next, t, pairs) = doubleOnce(cur, step, total, np)
      cur = next.localCheckpoint(true)
      pairs.unpersist()
      last.unpersist()
      last = cur
      ties = t
      step *= 2
      rounds += 1
    }
    addr.filter(col("code") =!= Sep)
      .join(cur, Seq("gid"))
      .select(col(idCol), col("pos"), col("gid"), col("rank").as("sa_rank"))
  }

  /** Duplicated-prefix groups at a FIXED power-of-two window: stop the
    * doubling at `prefixLen` codepoints and return each text position's
    * group id and group size — positions sharing a group share their
    * first `prefixLen` codepoints of the corpus string EXACTLY (the
    * suffix-array view of t15's duplicated k-grams, char-level and
    * windowing across document fences by construction). One extra
    * group count; rounds = log₂(prefixLen), convergence-free.
    */
  def prefixGroups(docs: DataFrame, idCol: String, textCol: String,
                   prefixLen: Int): DataFrame = {
    require(prefixLen > 0 && (prefixLen & (prefixLen - 1)) == 0,
      s"prefixLen must be a power of two (got $prefixLen)")
    val addr = addressed(docs, idCol, textCol).localCheckpoint(true)
    val total = addr.count()
    val np = rankParts(addr, total)
    var cur = addr.select(col("gid"), col("code").cast("long").as("rank"))
      .localCheckpoint(true)
    var last = cur
    var step = 1L
    while (step < prefixLen) {
      val (next, _, pairs) = doubleOnce(cur, step, total, np)
      cur = next.localCheckpoint(true)
      pairs.unpersist()
      last.unpersist()
      last = cur
      step *= 2
    }
    val sizes = cur.groupBy(col("rank")).agg(count(lit(1)).as("grp_size"))
    addr.filter(col("code") =!= Sep)
      .join(cur, Seq("gid"))
      .join(sizes, Seq("rank"))
      .select(col(idCol), col("pos"), col("gid"),
        col("rank").as("grp"), col("grp_size"))
  }
}
