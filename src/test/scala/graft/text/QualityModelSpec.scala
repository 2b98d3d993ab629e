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

  // ---- train (pocket batch perceptron) ------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h28(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(7), 16)

  /** Local replay of the pocket batch perceptron — the oracle's exact
    * arithmetic in plain Scala, used to pin the distributed loop
    * bit-for-bit on a small corpus.
    */
  private def pocketRef(texts: Seq[(String, Long)], nb: Int, epochs: Int): Array[Long] = {
    val feats = texts.map { case (t, y) =>
      val cnt = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
      t.split(" ", -1).foreach(tok => cnt(((h28(tok) % nb).toInt)) += 1L)
      cnt(nb) += 1L // bias
      (cnt.toMap, y)
    }
    var w = Array.fill(nb + 1)(0L)
    var best = w.clone(); var bestMis = Long.MaxValue
    var e = 0; var stop = false
    while (e < epochs && !stop) {
      val mis = feats.filter { case (cnt, y) =>
        y * cnt.map { case (b, c) => w(b) * c }.sum <= 0L
      }
      if (mis.size < bestMis) { bestMis = mis.size; best = w.clone() }
      if (mis.isEmpty) stop = true
      else {
        val nw = w.clone()
        mis.foreach { case (cnt, y) =>
          cnt.foreach { case (b, c) => nw(b) += y * c }
        }
        w = nw
      }
      e += 1
    }
    best
  }

  private val trainDocs = Seq(
    (1L, "alpha beta gamma delta", 1L),
    (2L, "alpha beta gamma", 1L),
    (3L, "zeta eta theta iota", -1L),
    (4L, "zeta eta theta", -1L),
    (5L, "alpha zeta", 1L),
    (6L, "beta eta", -1L),
    (7L, "gamma gamma gamma", 1L),
    (8L, "theta theta", -1L),
    (9L, "", -1L),
    (10L, "alpha alpha alpha beta", 1L)
  )

  test("train equals the local pocket replay bit-for-bit") {
    val df = trainDocs.toDF("doc_id", "text", "y")
    for (epochs <- Seq(1, 3, 8)) {
      val got = QualityModel.train(df, "doc_id", "text", "y", 32, epochs)
      val want = pocketRef(trainDocs.map(t => (t._2, t._3)), 32, epochs)
      assert(got.toSeq == want.toSeq, s"diverged at epochs=$epochs")
    }
  }

  test("train on separable labels converges and the served model reproduces them") {
    // Labels ARE a linear function of the features (token 'pos' vs
    // 'neg'), so the perceptron convergence theorem applies: the
    // pocket reaches zero misclassifications within the budget.
    val sep = (1L to 40L).map { i =>
      if (i % 2 == 0) (i, s"pos filler$i common", 1L)
      else (i, s"neg filler$i common", -1L)
    }
    val df = sep.toDF("doc_id", "text", "y")
    val w = QualityModel.train(df, "doc_id", "text", "y", 256, epochs = 64)
    val served = QualityModel
      .classifyWithModel(df, "doc_id", "text", 256,
        QualityModel.weightsTable(spark, w))
      .select($"doc_id", $"kept").as[(Long, Long)].collect().toMap
    sep.foreach { case (id, _, y) =>
      assert(served(id) == (if (y > 0) 1L else 0L), s"doc $id misclassified")
    }
  }

  test("train is deterministic across runs and partitionings") {
    val df = trainDocs.toDF("doc_id", "text", "y")
    val a = QualityModel.train(df, "doc_id", "text", "y", 32, 5)
    val b = QualityModel.train(df.repartition(7), "doc_id", "text", "y", 32, 5)
    assert(a.toSeq == b.toSeq)
  }

  test("classifyWithModel is a narrow map: no Exchange in the plan") {
    val w = Array.tabulate(33)(i => (i % 7 - 3).toLong)
    val plan = QualityModel
      .classifyWithModel(docs, "doc_id", "text", 32,
        QualityModel.weightsTable(spark, w))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"trained-model serving shuffled:\n$plan")
  }

  test("classifyWithModel folds the bias in as the score seed") {
    val w = Array.fill(33)(0L); w(32) = 7L // bias-only model
    val out = QualityModel
      .classifyWithModel(docs, "doc_id", "text", 32,
        QualityModel.weightsTable(spark, w))
      .select($"doc_id", $"score", $"kept").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("score") == 7L)
      assert(r.getAs[Long]("kept") == 1L)
    }
  }
}
