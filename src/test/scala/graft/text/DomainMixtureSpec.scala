package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the KL-to-budget mixture weighting: hand-computed smoothed KL
  * on a tiny corpus, the zero-KL target identity, integer budget
  * normalization, and the composed sampler's budget obedience.
  */
class DomainMixtureSpec extends SparkSpec {

  import spark.implicits._

  // Union vocab {a,b,c}: tgt has a,a,b (N=3); web has c,c,c (N=3);
  // mid has a,b,c (N=3). V=3, so every smoothed denom is 6.
  private val docs = Seq(
    (0L, "a a b", "tgt"),
    (1L, "c c c", "web"),
    (2L, "a b c", "mid")
  ).toDF("doc_id", "text", "source")

  private def term(cs: Long, ct: Long): Long =
    cs * math.round(math.log(cs.toDouble * 6 / (ct * 6)) * 1e6)

  test("smoothed KL is exact micro-nats; the target domain scores zero") {
    val kl = DomainMixture.domainKl(docs, "text", "source", "tgt")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("kl_scaled_micro")).toMap
    assert(kl("tgt") == 0L)
    // web: counts (a=0,b=0,c=3)+1 vs tgt (a=2,b=1,c=0)+1 over equal denoms.
    assert(kl("web") == term(1, 3) + term(1, 2) + term(4, 1))
    assert(kl("mid") == term(2, 3) + term(2, 2) + term(2, 1))
    assert(kl("web") > kl("mid")) // the more target-like domain is closer
  }

  test("budgets normalize inverse-KL weights in pure integer arithmetic") {
    val rows = DomainMixture.klBudgets(docs, "text", "source", "tgt", totalBudget = 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    val inv = rows.map { case (s, r) => s -> r.getAs[Long]("inv_w") }
    assert(inv("tgt") == 1000000L) // 1e12 div (1e6 + 0)
    val sumInv = inv.values.sum
    for ((s, r) <- rows)
      assert(r.getAs[Long]("budget_toks") == 100L * inv(s) / sumInv)
    assert(rows("tgt").getAs[Long]("budget_toks") >
      rows("mid").getAs[Long]("budget_toks"))
  }

  test("weights track per-token distance, not domain size (unequal-size domains)") {
    // Two domains with the SAME token distribution ("p p q") but 10×
    // different size, against a disjoint-vocab target. The scaled sum
    // grows ~10× with size; the per-token kl_micro (what weights
    // invert) must not — unnormalized, the big domain's weight
    // underflowed toward zero at equal true distance.
    val big = Seq.tabulate(330)(i => (1000L + i, "p p q", "dbig"))
    val small = Seq.tabulate(33)(i => (2000L + i, "p p q", "dsmall"))
    val tgt = Seq.tabulate(66)(i => (3000L + i, "t t u", "tgt"))
    val corpus = (big ++ small ++ tgt).toDF("doc_id", "text", "source")
    val rows = DomainMixture.klBudgets(corpus, "text", "source", "tgt",
      totalBudget = 10000L).collect().map(r => r.getString(0) -> r).toMap
    val scaledB = rows("dbig").getAs[Long]("kl_scaled_micro")
    val scaledS = rows("dsmall").getAs[Long]("kl_scaled_micro")
    val microB = rows("dbig").getAs[Long]("kl_micro")
    val microS = rows("dsmall").getAs[Long]("kl_micro")
    assert(scaledB > 5 * scaledS, s"scaled sum should grow with size: $scaledB vs $scaledS")
    assert(math.abs(microB - microS).toDouble / math.max(microB, microS) < 0.25,
      s"per-token KL should be ~size-free: $microB vs $microS")
    val bB = rows("dbig").getAs[Long]("budget_toks")
    val bS = rows("dsmall").getAs[Long]("budget_toks")
    assert(bB > 0 && bS > 0, s"no underflow-collapsed budgets: $bB, $bS")
    assert(math.abs(bB - bS).toDouble / math.max(bB, bS) < 0.1,
      s"equal-distance domains get ~equal budgets regardless of size: $bB vs $bS")
  }

  test("scaled KL sums stay non-negative (the clamp never actually fires)") {
    // kl_micro clamps the scaled sum at 0 before integer division so
    // Spark `div` (truncate) and DuckDB `//` (floor) can't diverge on a
    // hypothetical negative rounding sum. True KL is non-negative; this
    // asserts the per-term micro-nat rounding keeps the sums there on
    // both the hand corpus and a near-target domain (one-token delta
    // from the target — the case most likely to round below zero), so
    // a real divergence would fail HERE instead of being clamped away.
    val near = Seq.tabulate(40)(i => (5000L + i, "a a b", "tgt")) ++
      Seq.tabulate(40)(i => (6000L + i, if (i == 0) "a b b" else "a a b", "dnear"))
    val corpus = docs.union(near.toDF("doc_id", "text", "source"))
    val kl = DomainMixture.domainKl(corpus, "text", "source", "tgt").collect()
    for (r <- kl) {
      assert(r.getAs[Long]("kl_scaled_micro") >= 0L,
        s"negative scaled KL for ${r.getString(0)}")
      assert(r.getAs[Long]("kl_micro") >= 0L)
    }
  }

  test("composed sampler never exceeds a domain's derived budget") {
    val out = DomainMixture.klMixtureSample(
      docs.union(Seq((3L, "a b a", "tgt"), (4L, "c b c", "web")).toDF(
        "doc_id", "text", "source")),
      "doc_id", "text", "source", "tgt", totalBudget = 6L, salt = "s1")
    val budgets = DomainMixture.klBudgets(
      docs.union(Seq((3L, "a b a", "tgt"), (4L, "c b c", "web")).toDF(
        "doc_id", "text", "source")),
      "text", "source", "tgt", totalBudget = 6L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("budget_toks")).toMap
    for (r <- out.collect())
      assert(r.getAs[Long]("cum_tokens") <= budgets(r.getAs[String]("source")))
  }
}
