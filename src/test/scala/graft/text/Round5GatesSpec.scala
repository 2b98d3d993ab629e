package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{DedupQueries, TextQueries}

/** Closed-form fixtures for the round-5 gates: BM25 retrieval (t14),
  * duplicated-substring spans (t15), test-set decontamination (x3) and
  * SemDeDup (m7). Each builder is exercised against a hand-written
  * parquet table so every output value is derivable on paper; the
  * corpus-level behavior is gate-verified against DuckDB.
  */
class Round5GatesSpec extends SparkSpec {

  import spark.implicits._

  private def tmpTable(name: String, df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft-r5").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    dir
  }

  test("t14 BM25: closed-form scores on a 3-doc corpus") {
    // N = 3, avgdl = (3 + 4 + 3) / 3; doc 3 has no query term -> excluded.
    val dir = tmpTable("documents", Seq(
      (1L, "dup dup vector", "en", "a", 14L),
      (2L, "join join join join", "en", "a", 19L),
      (3L, "scan scan scan", "en", "a", 14L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val got = TextQueries.bm25TopK.build(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val avgdl = 10.0 / 3.0
    def tfSat(tf: Long, dl: Long): Double =
      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val idf = (3 - 1 + 0.5) / (1 + 0.5) // every query term occurs in exactly 1 doc
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === r6(idf * tfSat(2, 3) + idf * tfSat(1, 3))) // dup + vector
    assert(got(2L) === r6(idf * tfSat(4, 4))) // join only
  }

  test("t14 BM25: sf0.001 corpus returns a descending top-20") {
    val rows = TextQueries.bm25TopK.build(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("t15 substring spans: shared 40-char run merges into one span") {
    // Two docs share an exact 40-char prefix: 11 duplicated 30-gram
    // positions each (40 - 30 + 1), one island, span chars = 40.
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 40 chars
    require(shared.length == 40)
    val dir = tmpTable("documents", Seq(
      (1L, shared + "-one-unique-tail-padding-here!!", "en", "a", 0L),
      (2L, shared + "+two+unique+tail+padding+equal?", "en", "a", 0L),
      (3L, "no duplicated content in this row at all, distinct text.", "en", "a", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val got = TextQueries.substringSpans.build(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((11L, 1L, 40L)),
      2L -> ((11L, 1L, 40L))))
  }

  test("t15 substring spans: far-apart repeats stay separate islands") {
    // One doc repeats a 30-char block at positions 1 and 61: the gap
    // (60) exceeds the window width, so two spans of exactly 30 chars.
    val block = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcd" // 30 chars
    require(block.length == 30)
    val doc = block + ("x" * 30) + block
    val dir = tmpTable("documents", Seq(
      (1L, doc, "en", "a", 0L),
      (2L, "unrelated filler text that shares nothing with doc one....", "en", "a", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val got = TextQueries.substringSpans.build(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(1L -> ((2L, 2L, 60L))))
  }

  test("x3 decontamination: only true 4-shingle overlap flags a train doc") {
    val dir = tmpTable("documents", Seq(
      (10L, "alpha beta gamma delta epsilon", "en", "a", 0L), // benchmark (id % 10 = 0)
      (1L, "zz alpha beta gamma delta yy", "en", "a", 0L), // one shared 4-run
      (2L, "alpha beta zz gamma delta yy", "en", "a", 0L), // no 4-run overlap
      (3L, "alpha beta gamma delta epsilon", "en", "a", 0L) // exact copy: both shingles
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val got = TextQueries.decontaminate.build(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((1L, 1L)), // "alpha beta gamma delta" only
      3L -> ((2L, 1L))))
  }

  test("t16 filter pipeline: each filter sets its own mask bit") {
    val clean = (1 to 30).map(i => s"c$i").mkString(" ") // 30 distinct tokens
    val stopHeavy = (Seq.fill(10)("the") ++ (1 to 20).map(i => s"s$i")).mkString(" ")
    val contaminated = ("alpha beta gamma delta" +: (1 to 26).map(i => s"f$i")).mkString(" ")
    val dir = tmpTable("documents", Seq(
      (10L, "alpha beta gamma delta epsilon", "en", "a", 0L), // benchmark row
      (1L, clean, "en", "a", 0L), // passes everything
      (2L, clean, "en", "a", 0L), // exact dup of doc 1 -> bit 2
      (3L, "tiny doc", "en", "a", 0L), // short -> quality bit 0; topc*5 > n -> bit 1
      (4L, stopHeavy, "en", "a", 0L), // stopword-heavy -> bit 0; dominance -> bit 1
      (5L, contaminated, "en", "a", 0L) // shares a benchmark 4-shingle -> bit 3
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val got = TextQueries.filterPipeline.build(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((0L, 1L)),
      2L -> ((4L, 0L)),
      3L -> ((3L, 0L)),
      4L -> ((3L, 0L)),
      5L -> ((8L, 0L))))
  }

  test("m7 SemDeDup: near-identical pair in a cluster drops the higher id") {
    // Two tight clusters; ids 1/2 nearly parallel (cos ~ 1 -> remove 2),
    // ids 3/4 orthogonal (cos 0 < 0.3 -> both kept).
    val dir = tmpTable("embeddings", Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1),
      (4L, Array(0.0f, 0.0f, 0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label"))

    val got = DedupQueries.semDedup.build(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(1L)._2 === 1)
    assert(got(2L) === ((0, 0))) // same cluster as 1, cosine ~ 0.995 -> removed
    assert(got(3L)._2 === 1)
    assert(got(4L)._2 === 1)
  }
}
