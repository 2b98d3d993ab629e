package graft.text

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TextQueries

/** Closed-form fixtures for the round-6 text gates: span removal (t17),
  * C4-style segment dedup (t18), winnowed fingerprint overlap (t19) and
  * hashed n-gram target-affinity (t20). Every expected value is
  * derivable on paper; corpus-level behavior is gate-verified against
  * DuckDB.
  */
class Round6GatesSpec extends SparkSpec {

  import spark.implicits._

  private def tmpTable(name: String, df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft-r6").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    dir
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("t17 span removal: duplicated 40-char prefix is cut, tail survives") {
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 40 chars
    val tail1 = "-one-unique-tail-padding-here!!"
    val tail2 = "+two+unique+tail+padding+equal?"
    val dir = tmpTable("documents", Seq(
      (1L, shared + tail1, "en", "a", 0L),
      (2L, shared + tail2, "en", "a", 0L),
      (3L, "no duplicated content in this row at all, distinct text.", "en", "a", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val got = TextQueries.spanRemoval.build(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // Span grams at positions 1..11 -> chars [1, 40] removed exactly.
    assert(got(1L) === ((71L, 1L, 31L, md5hex(tail1))))
    assert(got(2L) === ((71L, 1L, 31L, md5hex(tail2))))
    // No spans: doc 3 passes through verbatim.
    val doc3 = "no duplicated content in this row at all, distinct text."
    assert(got(3L) === ((56L, 0L, 56L, md5hex(doc3))))
  }

  test("t18 segment dedup: keep-first across docs and within a doc") {
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val aSeg = toks("a", 10) // one exact 10-token segment
    val doc1 = aSeg + " " + toks("b", 10) + " " + toks("c", 5) // 3 segments
    val doc2 = aSeg + " " + toks("d", 10) // seg 0 duplicates doc1 seg 0
    val doc4 = toks("e", 10) + " " + toks("e", 10) // within-doc repeat
    val dir = tmpTable("documents", Seq(
      (1L, doc1, "en", "a", 0L),
      (2L, doc2, "en", "a", 0L),
      (4L, doc4, "en", "a", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val got = TextQueries.segmentDedup.build(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) === ((3L, 0L, md5hex(doc1))))
    // doc 2 loses its first segment; the d-segment re-assembles alone.
    assert(got(2L) === ((2L, 1L, md5hex(toks("d", 10)))))
    // doc 4 keeps only the first of its two identical segments.
    assert(got(4L) === ((2L, 1L, md5hex(toks("e", 10)))))
  }

  test("t19 winnowing: identical docs share every fingerprint; strangers none") {
    val same = "the quick brown fox jumps over the lazy dog again and again"
    val other = "zz entirely different content with no sixteen-char overlap qq"
    val dir = tmpTable("documents", Seq(
      (1L, same, "en", "a", 0L),
      (2L, same, "en", "a", 0L),
      (3L, other, "en", "a", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val rows = TextQueries.winnowing.build(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.keySet === Set((1L, 2L)))
    assert(rows((1L, 2L)) >= 5L) // winnowing selects >= 1 fp per 8-window
  }

  test("t19 winnowing guarantee: a shared 100-char run always pairs (20 random trials)") {
    // The winnowing theorem: every w consecutive gram hashes select at
    // least one fingerprint, and a gram can be the minimum of at most w
    // windows — so a shared run of L chars contains L-k-w+2 fully-inside
    // windows whose selections MATCH in both docs, yielding at least
    // ceil((L-k-w+2)/w) shared distinct fingerprints. L=100, k=16, w=8:
    // 78 inside windows -> >= 10 shared fps, clearing the gate's >= 5.
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 20).foreach { trial =>
      val shared = randStr(100)
      val docs = Seq(
        (1L, randStr(rnd.nextInt(40)) + shared + randStr(rnd.nextInt(40)), "en", "a", 0L),
        (2L, randStr(rnd.nextInt(40)) + shared + randStr(rnd.nextInt(40)), "en", "a", 0L),
        (3L, randStr(120), "en", "a", 0L))
      val dir = tmpTable("documents", docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
      val rows = TextQueries.winnowing.build(spark, dir)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      assert(rows.contains((1L, 2L)), s"trial $trial: shared run failed to pair")
      assert(rows((1L, 2L)) >= 10L, s"trial $trial: only ${rows((1L, 2L))} shared fps")
    }
  }

  test("t19 winnowing: fingerprints in > 50 docs are suppressed (no pairs)") {
    val boiler = "this exact boilerplate line appears in every single document"
    val docs = (1L to 60L).map(i => (i, boiler, "en", "a", 0L))
    val dir = tmpTable("documents", docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    // Every fingerprint has df = 60 > 50: MOSS common-fp suppression
    // leaves nothing to pair — the structural bound under boilerplate.
    assert(TextQueries.winnowing.build(spark, dir).count() === 0L)
  }

  test("x4 decontam spans: only a >= 30-char verbatim run with the benchmark flags") {
    val run = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 chars
    val dir = tmpTable("documents", Seq(
      (10L, run + " benchmark only tail", "en", "a", 0L), // benchmark row
      (1L, "train prefix " + run + " train tail!", "en", "a", 0L), // shares the full run
      (2L, "no overlap with the benchmark document whatsoever here.", "en", "a", 0L),
      (3L, run.take(29) + "X different after twenty-nine", "en", "a", 0L) // < k chars shared
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val got = TextQueries.decontamSpans.build(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // Doc 1 shares the 36-char run PLUS the space both docs append —
    // 37 chars, 8 matching 30-gram positions, one span. Docs 2 and 3
    // never reach the output.
    assert(got === Map(1L -> ((1L, 8L, 37L))))
  }

  test("t15/t17 invariant: clean_len = orig_len - dup_chars on the sf0.001 corpus") {
    val dup = TextQueries.substringSpans.build(spark, "/root/testdata/sf0.001")
      .select("doc_id", "dup_chars")
    val cleaned = TextQueries.spanRemoval.build(spark, "/root/testdata/sf0.001")
      .select("doc_id", "orig_len", "clean_len")
    val bad = cleaned.join(dup, Seq("doc_id"), "left_outer")
      .where(coalesce(col("dup_chars"), lit(0L)) =!= col("orig_len") - col("clean_len"))
      .count()
    assert(bad === 0L)
  }

  test("t18 invariant: n_segs = ceil(tokens/10) for every sf0.001 document") {
    val segs = TextQueries.segmentDedup.build(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_segs")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        ceil((size(split(col("text"), " ")) / lit(10.0))).cast("long").as("want"))
    assert(segs.join(docs, "doc_id").where(col("n_segs") =!= col("want")).count() === 0L)
  }

  test("t22 bucketed dedup read: no hash exchange or sort before the fp window") {
    val got = TextQueries.dedupBucketedDocs.build(spark, "/root/testdata/sf0.001")
    // Same rows as t3 (the layout is semantics-free)…
    val want = TextQueries.exactDedup.build(spark, "/root/testdata/sf0.001")
    assert(got.collect().toSeq === want.collect().toSeq)
    // …but the per-fp window rides the bucketed scan: the only
    // exchange in the plan is the output's global orderBy.
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Exchange rangepartitioning"))
  }

  test("t21 gopher repetition: closed-form fractions and the g-desc tie-break") {
    val dir = tmpTable("documents", Seq(
      (1L, "x y x y z", "en", "a", 0L), // top 2-gram "x y" x2
      (2L, "a b c d", "en", "a", 0L), // all 2-grams tie at 1 -> "c d" by g DESC
      (3L, "p q r p q r p q r", "en", "a", 0L) // heavy 3-gram repetition
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val got = TextQueries.gopherRepetition.build(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // doc 1: "x y" cnt 2, chars 6; 6*5 > 9 -> fail top2; no dup 3-grams.
    assert(got(1L) === ((9L, 2L, 6L, 0L, 0L, 1L)))
    // doc 2: tie on (cnt=1, chars=3) resolved by gram text descending.
    assert(got(2L) === ((7L, 1L, 3L, 0L, 0L, 1L)))
    // doc 3: top2 "q r" (tie with "p q" at cnt 3, chars 9); dup3 =
    // 3*5 + 2*5 + 2*5 = 35; both fractions over threshold.
    assert(got(3L) === ((17L, 3L, 9L, 35L, 0L, 0L)))
  }

  test("t20 ngram affinity: integer sums against target / raw bucket counts") {
    val dir = tmpTable("documents", Seq(
      (10L, "a b a b", "en", "a", 0L), // target slice: bigrams ab, ba, ab
      (1L, "a b c", "en", "a", 0L), // raw: ab, bc
      (2L, "c c", "en", "a", 0L) // raw: cc
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

    val got = TextQueries.ngramAffinity.build(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // tc = {ab: 2, ba: 1}; rc = {ab: 1, bc: 1, cc: 1} (no bucket
    // collisions among these four bigrams in 4096 buckets — pinned by
    // the expected values themselves).
    assert(got === Map(
      1L -> ((2L, 2L, 2L)), // tsum = tc(ab) + tc(bc) = 2 + 0
      2L -> ((1L, 0L, 1L)))) // cc: unseen in target, own raw count
  }
}
