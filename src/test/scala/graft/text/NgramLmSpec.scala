package graft.text

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the CCNet-style trigram stupid-backoff scorer: exact
  * micro-nat log-probs for each backoff path on a hand-computed
  * corpus, path liveness, and the head/middle/tail split.
  */
class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  // Reference doc: "a b c a b d" — trigrams: abc, bca, cab, abd;
  // bigrams: ab(2) bc bd ca; unigrams: a(2) b(2) c d; N=6 V=4.
  private val docs = Seq(
    (0L, "a b c a b d", "src0"),
    (1L, "a b c x y z", "web"), // trigram hit (abc), then OOV tail
    (2L, "d c b a d c", "web")  // seen words, unseen bigrams/trigrams
  ).toDF("doc_id", "text", "source")

  private def micro(p: Double): Long = math.round(math.log(p) * 1e6)

  test("each backoff path scores its exact micro-nat log-prob") {
    val lm = NgramLm.train(docs.where($"source" === "src0"), "doc_id", "text")
    assert(lm.nTokens == 6L && lm.vocab == 4L)
    val scored = NgramLm.scoreDocs(docs, lm, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    // Doc 0 (the reference itself): pos1 'a' -> uni path 0.16*2/6;
    // pos2 'b' -> bigram 0.4*c(ab)/c(a)=0.4*2/2; pos3.. trigrams c=1
    // over their context bigram counts: abc/ab=1/2, bca/bc=1, cab/ca=1,
    // abd/ab=1/2.
    val d0 = scored(0L)
    val expected0 = -(micro(0.16 * 2 / 6) + micro(0.4 * 2 / 2) +
      micro(1.0 / 2) + micro(1.0) + micro(1.0) + micro(1.0 / 2))
    assert(d0.getAs[Long]("score_micro") == expected0)
    assert(d0.getAs[Long]("n_tri") == 4 && d0.getAs[Long]("n_bi") == 1 &&
      d0.getAs[Long]("n_uni") == 1)

    // Doc 1: 'a'(uni) 'b'(bi) 'c'(tri abc) then x,y,z = true-OOV floor
    // 0.16/(N+V) three times.
    val d1 = scored(1L)
    val expected1 = -(micro(0.16 * 2 / 6) + micro(0.4 * 2 / 2) + micro(1.0 / 2) +
      3 * micro(0.16 / 10))
    assert(d1.getAs[Long]("score_micro") == expected1)
    assert(d1.getAs[Long]("n_uni") == 4) // OOV tokens count as the uni path

    // Doc 2: every bigram unseen -> all uni-path: d(1/6) c(1/6) b(2/6)
    // a(2/6) d c — in-vocab so 0.16*c/N each.
    val d2 = scored(2L)
    val expected2 = -(2 * micro(0.16 * 1 / 6) + micro(0.16 * 1 / 6) +
      micro(0.16 * 2 / 6) + micro(0.16 * 2 / 6) + micro(0.16 * 1 / 6))
    assert(d2.getAs[Long]("score_micro") == expected2)
    assert(d2.getAs[Long]("n_tri") == 0 && d2.getAs[Long]("n_bi") == 0 &&
      d2.getAs[Long]("n_uni") == 6)
  }

  test("DSIR selection ranks the target-like doc first and cuts at the budget") {
    // logratio = score_raw - score_tgt: doc0 (the target slice itself)
    // must rank above the OOV-tailed doc1 and the bigram-less doc2.
    val out = NgramLm
      .importanceSelection(docs, "doc_id", "text", "source", "src0", budgetToks = 7L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("logratio_micro") > out(1L).getAs[Long]("logratio_micro"))
    assert(out(0L).getAs[Long]("logratio_micro") > out(2L).getAs[Long]("logratio_micro"))
    // Budget 7 fits doc0 (6 toks) but not doc0+next (12): prefix cut.
    assert(out(0L).getAs[Long]("kept") == 1)
    assert(out(1L).getAs[Long]("kept") == 0 && out(2L).getAs[Long]("kept") == 0)
    // The ratio is exactly the difference of the two scoreDocs runs.
    val lmT = NgramLm.train(docs.where($"source" === "src0"), "doc_id", "text")
    val lmR = NgramLm.train(docs, "doc_id", "text")
    val st = NgramLm.scoreDocs(docs, lmT, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("score_micro")).toMap
    val sr = NgramLm.scoreDocs(docs, lmR, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("score_micro")).toMap
    for (id <- Seq(0L, 1L, 2L))
      assert(out(id).getAs[Long]("logratio_micro") == sr(id) - st(id))
  }

  // A corpus big enough that terciles/budget cut spread across many
  // range partitions: deterministic word soup over a 12-word vocab,
  // `src0` = the cleanest third.
  private def soup120 = {
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    (0L until 120L).map { i =>
      val len = 5 + (i % 7).toInt
      val text = (0 until len)
        .map(j => words(((i * 31 + j * (1 + (i % 5))) % words.length).toInt))
        .mkString(" ")
      (i, text, if (i % 3 == 0) "src0" else "web")
    }.toDF("doc_id", "text", "source")
  }

  test("two-pass ranked cuts equal the window form on LM scores (120-doc corpus)") {
    val corpus = soup120

    // Terciles: two-pass NTILE ≡ the window NTILE on the same scores.
    val lm = NgramLm.train(corpus.where($"source" === "src0"), "doc_id", "text")
    val perDoc = NgramLm.scoreDocs(corpus, lm, "doc_id", "text").localCheckpoint(true)
    val wantBuckets = perDoc
      .withColumn("b", ntile(3).over(Window.orderBy(
        $"score_micro".cast("double") / $"n_toks", $"doc_id")).cast("long"))
      .select($"doc_id", $"b").orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    val gotBuckets = NgramLm
      .perplexityBuckets(corpus, "doc_id", "text", "source", "src0")
      .select($"doc_id", $"ppl_bucket").orderBy($"doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(gotBuckets == wantBuckets)

    // Budget prefix: two-pass running sum ≡ the window running sum.
    val sel = NgramLm
      .importanceSelection(corpus, "doc_id", "text", "source", "src0", budgetToks = 300L)
      .localCheckpoint(true)
    val wantCum = sel
      .withColumn("wc", sum($"n_toks").over(
        Window.orderBy($"logratio_micro".desc, $"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"doc_id", $"wc").orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    val gotCum = sel.select($"doc_id", $"cum_toks").orderBy($"doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(gotCum == wantCum)
    // And the cut keeps exactly the prefix under the budget.
    val kept = sel.select($"cum_toks", $"kept").as[(Long, Long)].collect()
    assert(kept.forall { case (c, k) => (c <= 300L) == (k == 1L) })
    assert(kept.exists(_._2 == 1L) && kept.exists(_._2 == 0L))
  }

  test("approx-percentile cut tracks the exact NTILE terciles (the recipe's other leg)") {
    val corpus = soup120
    val exact = NgramLm
      .perplexityBuckets(corpus, "doc_id", "text", "source", "src0")
      .select($"doc_id", $"ppl_bucket").as[(Long, Long)].collect().toMap
    val approx = NgramLm
      .perplexityBucketsApprox(corpus, "doc_id", "text", "source", "src0")
      .select($"doc_id", $"ppl_bucket", $"kept").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // all three buckets live, kept consistent with the bucket
    assert(approx.map(_._2).toSet == Set(1L, 2L, 3L))
    assert(approx.forall { case (_, b, k) => (b <= 2) == (k == 1L) })
    // value-cut vs rank-cut may only disagree at boundaries (ties /
    // sketch error): sizes within a few docs of 40/40/40, high agreement
    val sizes = approx.groupBy(_._2).view.mapValues(_.size).toMap
    sizes.values.foreach(s => assert(math.abs(s - 40) <= 4, s"sizes $sizes"))
    val agree = approx.count { case (id, b, _) => exact(id) == b }
    assert(agree >= 108, s"agreement $agree/120") // >= 90%
  }

  test("approx budget cut tracks the exact DSIR prefix within its stated error") {
    val corpus = soup120
    val budget = 300L
    val exact = NgramLm
      .importanceSelection(corpus, "doc_id", "text", "source", "src0", budget)
      .select($"doc_id", $"logratio_micro", $"n_toks", $"kept").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("logratio_micro"),
        r.getAs[Long]("n_toks"), r.getAs[Long]("kept")))
    val approx = NgramLm
      .importanceSelectionApprox(corpus, "doc_id", "text", "source", "src0", budget)
      .select($"doc_id", $"logratio_micro", $"n_toks", $"kept",
        $"ratio_threshold_micro", $"budget_over_toks").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("logratio_micro"),
        r.getAs[Long]("n_toks"), r.getAs[Long]("kept"),
        r.getAs[Long]("ratio_threshold_micro"), r.getAs[Long]("budget_over_toks")))
    // identical ratios (same fused dual scoring)
    val er = exact.map(x => x._1 -> x._2).toMap
    approx.foreach { case (id, r, _, _, _, _) => assert(er(id) == r) }
    // admission IS the broadcast threshold
    val thr = approx.head._5
    approx.foreach { case (_, r, _, k, t, _) =>
      assert(t == thr)
      assert((r >= thr) == (k == 1L))
    }
    // kept tokens land in [budget, budget + reported overshoot]; the
    // overshoot is the crossing bin's partial mass, and with 10k bins
    // over this spread it is a handful of docs at most
    val keptToks = approx.filter(_._4 == 1L).map(_._3).sum
    val over = approx.head._6
    assert(keptToks >= math.min(budget, approx.map(_._3).sum),
      s"under budget: $keptToks")
    assert(keptToks - budget <= over, s"overshoot $keptToks vs declared $over")
    // agreement with the exact prefix: only boundary docs may differ
    val ek = exact.filter(_._4 == 1L).map(_._1).toSet
    val ak = approx.filter(_._4 == 1L).map(_._1).toSet
    val diffToks = approx.filter(x => ak(x._1) != ek(x._1)).map(_._3).sum
    assert(diffToks <= over + exact.filter(x => ek(x._1)).map(_._3).max,
      s"boundary disagreement too large: $diffToks tokens")
    assert(ak.intersect(ek).size >= (ek.size * 9) / 10,
      s"agreement ${ak.intersect(ek).size}/${ek.size}")
  }

  test("terciles order by avg nats: reference doc is head, noise is tail") {
    val out = NgramLm.perplexityBuckets(docs, "doc_id", "text", "source", "src0")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // avg nats/token: doc0 0.87 (head), doc1 2.82 (middle), doc2 3.39 (tail)
    assert(out(0L).getAs[Long]("ppl_bucket") == 1 && out(0L).getAs[Long]("kept") == 1)
    assert(out(1L).getAs[Long]("ppl_bucket") == 2 && out(1L).getAs[Long]("kept") == 1)
    assert(out(2L).getAs[Long]("ppl_bucket") == 3 && out(2L).getAs[Long]("kept") == 0)
  }
}
