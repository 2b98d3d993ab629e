package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Frozen linear quality model: determinism, integer-exactness, plan
  * shape (no shuffle before the final projection).
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick brown fox"), // identical text → identical score
    (3L, "lorem ipsum dolor sit amet consectetur"),
    (4L, "a")
  ).toDF("doc_id", "text")

  test("identical text scores identically; score is the token-weight sum") {
    val out = QualityModel.classify(docs, "doc_id", "text", 4096, "s").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("score") == out(2L).getAs[Long]("score"))
    assert(out(1L).getAs[Long]("n_tokens") == 4L)
    // reference score computed token-by-token through the same column fns
    val perTok = Seq("the", "quick", "brown", "fox").map { t =>
      spark.range(1).select(
        QualityModel.weight(QualityModel.bucket(lit(t), 4096), "s").as("w"))
        .as[Long].head()
    }
    assert(out(1L).getAs[Long]("score") == perTok.sum)
    perTok.foreach(w => assert(w >= -100 && w <= 100))
    // kept flag is exactly score > 0
    out.values.foreach { r =>
      assert(r.getAs[Long]("kept") == (if (r.getAs[Long]("score") > 0) 1L else 0L))
    }
  }

  test("scoring is a narrow map: no Exchange in the classify plan") {
    val plan = QualityModel.classify(docs, "doc_id", "text", 4096, "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quality scoring shuffled:\n$plan")
  }

  test("weights differ across salts (model identity is the salt)") {
    val a = QualityModel.classify(docs, "doc_id", "text", 4096, "s")
      .select(sum($"score")).as[Long].head()
    val b = QualityModel.classify(docs, "doc_id", "text", 4096, "other")
      .select(sum($"score")).as[Long].head()
    assert(a != b)
  }

  test("classifyWithWeights fed the hash-derived weights equals classify") {
    // the swap-in contract the scaladoc claims: TRAINED weights load as
    // a (bucket, weight) table and change nothing else
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h28(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(7), 16)
    val nb = 512
    val weights = (0 until nb).map(b => (b.toLong, h28(s"s:$b") % 201 - 100))
      .toDF("bucket", "weight")
    val a = QualityModel.classify(docs, "doc_id", "text", nb, "s")
      .orderBy($"doc_id").collect().toSeq
    val b = QualityModel.classifyWithWeights(docs, "doc_id", "text", nb, weights)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b, "weights-table variant diverged from the hash-derived fold")
  }
}
