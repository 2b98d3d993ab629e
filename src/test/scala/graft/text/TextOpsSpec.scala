package graft.text

import graft.SparkSpec

/** Closed-form fixtures for the round-3 text operators (repetition
  * signals, PII scrub) — the corpus-level behavior is gate-verified
  * (t10/t11); these pin the operator edge cases.
  */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("repetitionProfile: ratios and integer-exact pass gate") {
    val docs = Seq(
      (1L, "a a a b"),            // dominated by one token
      (2L, "w x y z w x y z"),    // diverse tokens, repeated bigrams
      (3L, "p q r s t u v w x p") // near-unique
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val d1 = got(1L)
    assert(d1.getAs[Long]("n_tokens") === 4 && d1.getAs[Long]("n_distinct") === 2)
    assert(d1.getAs[Long]("top_token_count") === 3)
    // bigrams: "a a","a a","a b" → 1 of 3 duplicated
    assert(d1.getAs[Double]("dup_bigram_ratio") === 0.333333)
    // distinct ok (2*10 >= 4*3) but top-token dominance fails (3*5 > 4)
    assert(d1.getAs[Long]("passes_repetition") === 0)

    val d2 = got(2L)
    assert(d2.getAs[Long]("n_distinct") === 4 && d2.getAs[Long]("top_token_count") === 2)
    // 7 bigrams, 4 distinct ("w x","x y","y z","z w")
    assert(d2.getAs[Double]("dup_bigram_ratio") === 0.428571)
    // top token holds 2/8 = 25% > the 20% dominance bound → fails
    assert(d2.getAs[Long]("passes_repetition") === 0)

    val d3 = got(3L)
    assert(d3.getAs[Long]("n_distinct") === 9)
    assert(d3.getAs[Double]("dup_bigram_ratio") === 0.0)
    assert(d3.getAs[Long]("passes_repetition") === 1)
  }

  test("packChunks: concat-then-split layout; shards pack independently") {
    val chunks = Seq(
      // shard 0: tokens 300 + 300 + 100 → bins 0, 0(+300), 1(+88)... with budget 512:
      // priors 0, 300, 600 → bins 0, 0, 1; offsets 0, 300, 88
      (1L, 0L, 300L, 0), (1L, 1L, 300L, 0), (2L, 0L, 100L, 0),
      // shard 1 restarts at zero regardless of shard 0's fill
      (3L, 0L, 500L, 1), (3L, 1L, 20L, 1)
    ).toDF("doc_id", "chunk_idx", "n_tokens", "shard")
    val got = TextOps.packChunks(chunks, "doc_id", "chunk_idx", "n_tokens", "shard", 512)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got((1L, 0L)) === (0L, 0L))
    assert(got((1L, 1L)) === (0L, 300L))
    assert(got((2L, 0L)) === (1L, 88L)) // 600 DIV 512 = 1, 600 mod 512 = 88
    assert(got((3L, 0L)) === (0L, 0L)) // shard 1 has its own counter
    assert(got((3L, 1L)) === (0L, 500L))
  }

  test("scrubPii: each type redacted; digit runs without boundaries don't false-match") {
    val docs = Seq(
      (1L, "mail bob.smith+tag@corp.example.org now"),
      (2L, "call 555-123-4567 or ssn 123-45-6789"),
      (3L, "host 192.168.1.255 up"),
      // near-misses: 4-3-4 digits is not a NANP phone; no-@ not an email
      (4L, "code 1234-567-8901 and name at example.com")
    ).toDF("doc_id", "text")
    val got = TextOps.scrubPii(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(got(1L).getAs[Long]("n_email") === 1)
    assert(got(1L).getAs[String]("scrubbed") === "mail [EMAIL] now")
    assert(got(2L).getAs[Long]("n_phone") === 1 && got(2L).getAs[Long]("n_ssn") === 1)
    assert(got(2L).getAs[String]("scrubbed") === "call [PHONE] or ssn [SSN]")
    assert(got(3L).getAs[Long]("n_ipv4") === 1)
    assert(got(3L).getAs[String]("scrubbed") === "host [IPV4] up")
    val d4 = got(4L)
    assert(d4.getAs[Long]("n_phone") === 0 && d4.getAs[Long]("n_email") === 0)
    assert(d4.getAs[String]("scrubbed") === "code 1234-567-8901 and name at example.com")
    assert(d4.getAs[Long]("scrubbed_len") === d4.getAs[String]("scrubbed").length)
  }

  test("dedupLines: corpus keep-first over duplicated lines, short lines exempt") {
    // boiler = the repeated crawl line (>= minChars); docs 0 and 2
    // carry it, doc 0 first. Short lines ("", "ok") repeat everywhere
    // and must ALWAYS survive (the CCNet length floor). Doc 3 is
    // nothing but copies of lines seen earlier -> fully deduped, empty.
    val boiler = "SHARED BOILERPLATE LINE OF THE WHOLE CRAWL SITE"
    val uniq0 = "first document unique body line long enough"
    val uniq2 = "second unique body line also long enough here"
    val docs = Seq(
      (0L, s"$boiler\n$uniq0\nok"),
      (1L, "ok\n\nok"),
      (2L, s"$boiler\n$uniq2\n\nok"),
      (3L, s"$boiler\n$uniq0")
    ).toDF("doc_id", "text")
    val got = TextOps.dedupLines(docs, "doc_id", "text", minChars = 30)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(got(0L).getAs[String]("clean_text") === s"$boiler\n$uniq0\nok")
    assert(got(0L).getAs[Long]("n_lines") === 3 && got(0L).getAs[Long]("n_kept") === 3)
    // short lines never deduped, even as exact corpus-wide repeats
    assert(got(1L).getAs[String]("clean_text") === "ok\n\nok")
    // doc 2 loses only the boilerplate (doc 0 holds the first copy)
    assert(got(2L).getAs[String]("clean_text") === s"$uniq2\n\nok")
    assert(got(2L).getAs[Long]("n_lines") === 4 && got(2L).getAs[Long]("n_kept") === 3)
    // every long line of doc 3 was seen earlier -> empty, not null
    assert(got(3L).getAs[String]("clean_text") === "")
    assert(got(3L).getAs[Long]("n_kept") === 0)

    // partitioning invariance: the census min is associative
    val re = TextOps.dedupLines(docs.repartition(7), "doc_id", "text", 30)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("clean_text")).toMap
    assert((0L to 3L).forall(i => re(i) === got(i).getAs[String]("clean_text")))
  }
}
