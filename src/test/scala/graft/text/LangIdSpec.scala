package graft.text

import graft.SparkSpec

/** Pins the fastText-style LID against an ANALYTIC replay: the same
  * md5-prefix hashing, boundary-marked trigram extraction, per-language
  * frozen weights, and tie-to-smallest argmax computed in plain JVM
  * code — so a drift in any hash, marker, window, or the argmax chain
  * fails here with the exact score, not just a gate hash mismatch.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h28(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(7), 16)

  private def refScores(text: String, numBuckets: Int, salt: String)
      : (Long, Map[String, Long]) = {
    val grams = text.split(" ", -1).filter(_.nonEmpty).flatMap { w =>
      val mw = s"<$w>"
      (0 until w.length).map(i => mw.substring(i, i + 3))
    }
    val buckets = grams.map(g => h28(g) % numBuckets)
    (buckets.length.toLong,
      LangId.Langs.map(l =>
        l -> buckets.map(b => h28(s"$salt:$l:$b") % 201 - 100).sum).toMap)
  }

  private def refPred(s: Map[String, Long]): String =
    LangId.Langs.init.find { l =>
      LangId.Langs.dropWhile(_ != l).tail.forall(o => s(l) >= s(o))
    }.getOrElse(LangId.Langs.last)

  test("scores and argmax equal the analytic md5 replay") {
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "der schnelle braune fuchs"),
      (2L, "x"), // single char: one trigram <x>
      (3L, ""), // no grams: all scores 0, tie -> first language
      (4L, "a  b")) // double space: empty word contributes nothing
    val got = LangId.classify(docs.toDF("doc_id", "text"), "doc_id", "text",
      numBuckets = 4096, salt = "lid1")
      .orderBy($"doc_id").collect()
    docs.foreach { case (id, text) =>
      val (n, sc) = refScores(text, 4096, "lid1")
      val row = got.find(_.getLong(0) == id).get
      assert(row.getAs[Long]("n_grams") == n, s"doc $id n_grams")
      LangId.Langs.foreach(l =>
        assert(row.getAs[Long](s"s_$l") == sc(l), s"doc $id s_$l"))
      assert(row.getAs[String]("pred_lang") == refPred(sc), s"doc $id pred")
    }
    // the no-gram doc ties everywhere and must resolve to the smallest name
    assert(got.find(_.getLong(0) == 3L).get.getAs[String]("pred_lang") == "de")
  }

  test("trigram features are boundary-marked (prefix/suffix distinguishable)") {
    // "ab" yields trigrams {<ab, ab>}; "ba" yields {<ba, ba>} — the
    // marked sets are disjoint, so scores differ with overwhelming
    // probability under any salt; unmarked trigrams of 2-char words
    // would not exist at all.
    val docs = Seq((0L, "ab"), (1L, "ba")).toDF("doc_id", "text")
    val got = LangId.classify(docs, "doc_id", "text", 4096, "lid1")
      .orderBy($"doc_id").collect()
    assert(got(0).getAs[Long]("n_grams") == 2L)
    assert(LangId.Langs.exists(l =>
      got(0).getAs[Long](s"s_$l") != got(1).getAs[Long](s"s_$l")))
  }

  test("classifyWithWeights fed the hash-derived weights equals classify") {
    // the swap-in contract the scaladoc claims: TRAINED weights load as
    // a (bucket, lang, weight) table and change nothing else
    val nb = 512
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").where($"doc_id" < 100)
    val weights = (0 until nb).flatMap(b => LangId.Langs.map(l =>
      (b.toLong, l, h28(s"wspec:$l:$b") % 201 - 100)))
      .toDF("bucket", "lang", "weight")
    val a = LangId.classify(docs, "doc_id", "text", nb, "wspec")
      .orderBy($"doc_id").collect().toSeq
    val b = LangId.classifyWithWeights(docs, "doc_id", "text", nb, weights)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b, "weights-table variant diverged from the hash-derived fold")
  }

  test("classifyWithWeights: a table favoring one language wins every doc") {
    val docs = Seq((0L, "hello there"), (1L, "bonjour le monde")).toDF("doc_id", "text")
    val nb = 64
    val weights = (0 until nb).map(b => (b.toLong, "fr", 5L)).toDF("bucket", "lang", "weight")
    val got = LangId.classifyWithWeights(docs, "doc_id", "text", nb, weights)
      .select($"pred_lang").as[String].collect()
    assert(got.forall(_ == "fr"))
  }
}
