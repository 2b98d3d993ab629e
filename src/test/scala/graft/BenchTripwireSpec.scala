package graft

import org.scalatest.funsuite.AnyFunSuite

/** The self-enforcing 2× bar: a gate regressing past twice its frozen
  * baseline must land in the failure artifact; a clean battery writes
  * the empty all-clear.
  */
class BenchTripwireSpec extends AnyFunSuite {

  private val baseline = Map("a1_top" -> 1.0, "m2_lsh" -> 0.5, "t19_win" -> 4.0)

  test("an artificially slowed gate fires the tripwire with its ratio") {
    val results = Map("a1_top" -> 1.1, "m2_lsh" -> 1.6, "t19_win" -> 3.9)
    val hit = Bench.tripwire(results, baseline)
    assert(hit.keySet == Set("m2_lsh"))
    assert(math.abs(hit("m2_lsh") - 3.2) < 1e-9)
  }

  test("silent otherwise — at-the-bar and baseline-free gates never trip") {
    // exactly 2.0x is within the bar (strict >); new gates have no entry
    val results = Map("a1_top" -> 2.0, "t19_win" -> 4.2, "brand_new_gate" -> 99.0)
    assert(Bench.tripwire(results, baseline).isEmpty)
  }

  test("sub-second jitter past 2x does NOT trip — the absolute excess floor") {
    // a 0.2s-baseline gate at 0.55s is 2.75x but only +0.35s — host
    // scheduling noise, not a regression (measured round 11: such
    // "offenders" reproduced solo at baseline shape while the bench
    // probes showed 1.1-1.3x host drift)
    val noisy = Map("c2_tiny" -> 0.55)
    assert(Bench.tripwire(noisy, Map("c2_tiny" -> 0.2)).isEmpty)
    // the same ratio WITH real excess fires
    val real = Map("c2_tiny" -> 2.75)
    assert(Bench.tripwire(real, Map("c2_tiny" -> 1.0)).keySet == Set("c2_tiny"))
  }

  test("a single cold pass computes NO tripwire — even with huge ratios") {
    // the round-11 failure mode: one contended 420 s-budget pass read
    // 2.52x with 20 phantom offenders; a lone pass must never produce a
    // verdict
    val onePass = Seq(Map("a1_top" -> 37.0, "m2_lsh" -> 19.0))
    assert(Bench.tripwireStat(onePass).isEmpty)
    // end-to-end: the artifact written from a cold pass is the empty {}
    val dir = java.nio.file.Files.createTempDirectory("coldpass")
    val p = dir.resolve("_bench_failures.json").toString
    Bench.writeTripwire(p,
      Bench.tripwireStat(onePass).map(s => Bench.tripwire(s, baseline)).getOrElse(Map.empty))
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(p)).trim == "{}")
  }

  test("a gate present only in the cold pass never enters the stat (partial warm pass)") {
    // the budget-truncated warm pass covered a1_top but not m2_lsh:
    // m2_lsh's lone cold sample must not be judged (it would phantom-
    // trip at 19.0 vs baseline 0.5), while a1_top's warm min is live
    val passes = Seq(
      Map("a1_top" -> 37.0, "m2_lsh" -> 19.0), // cold, complete
      Map("a1_top" -> 0.9)) // warm, truncated before m2_lsh
    val stat = Bench.tripwireStat(passes).get
    assert(stat == Map("a1_top" -> 0.9))
    assert(Bench.tripwire(stat, baseline).isEmpty)
    // a warm pass that covered NOTHING degenerates to the cold case
    assert(Bench.tripwireStat(Seq(Map("a1_top" -> 37.0), Map.empty)).isEmpty)
  }

  test("two passes judge the per-gate MIN — one contended pass cannot fire it") {
    val passes = Seq(
      Map("a1_top" -> 37.0, "m2_lsh" -> 19.0), // contended / cold
      Map("a1_top" -> 0.9, "m2_lsh" -> 0.45)) // quiet
    val stat = Bench.tripwireStat(passes).get
    assert(stat == Map("a1_top" -> 0.9, "m2_lsh" -> 0.45))
    assert(Bench.tripwire(stat, baseline).isEmpty)
    // a REAL regression is slow in every pass and still fires
    val real = Seq(Map("a1_top" -> 5.0), Map("a1_top" -> 4.8))
    assert(Bench.tripwire(Bench.tripwireStat(real).get, baseline).keySet == Set("a1_top"))
  }

  test("sf1 dirs route to the sf1 frozen baseline; everything else to sf0.1's") {
    assert(Bench.defaultBaselinePath("/root/repo/.bench/sf1") == "BASELINE_sf1.json")
    assert(Bench.defaultBaselinePath("/root/repo/.bench/sf1/") == "BASELINE_sf1.json")
    assert(Bench.defaultBaselinePath("/root/testdata/sf0.1") == "BASELINE_sf01.json")
    assert(Bench.defaultBaselinePath("/root/testdata/sf0.001") == "BASELINE_sf01.json")
  }

  test("compact-line probe/cold fields parse as JSON") {
    // the fields emit() appends must compose into valid JSON — pin the
    // exact shapes here so a format change fails a test, not a round
    val line = """{"metric":"total","value":1.23,"unit":"sec","queries":{"a1":0.10},""" +
      """"sf":"sf0.001","iters":1,"probe":1.50,"probe_mt":1.62,""" +
      """"cold_pass":true,"tripwire":"skipped-cold","vs_baseline":1.01}"""
    import org.json4s._
    val j = jackson.JsonMethods.parse(line)
    assert((j \ "probe") == JDouble(1.5))
    assert((j \ "cold_pass") == JBool(true))
    assert((j \ "tripwire") == JString("skipped-cold"))
  }

  test("committed baselines carry the sf marker the loader gates on") {
    // Bench loads a baseline ONLY when its "sf" field suffix-matches
    // the run dir; a re-freeze that drops the field silently disables
    // vs_baseline AND the tripwire for every later run (it happened:
    // the round-15 close rewrote both files with only {queries,
    // source} and two closing benches ran tripwire-vacuous). Pin the
    // envelope so the next re-freeze can't repeat it.
    import org.json4s._
    for ((path, sf) <- Seq("BASELINE_sf01.json" -> "sf0.1",
                           "BASELINE_sf1.json" -> "sf1")) {
      val j = jackson.JsonMethods.parse(
        java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
      assert((j \ "sf") == JString(sf), s"$path lost its sf marker")
      val n = (j \ "queries") match {
        case JObject(fields) => fields.size
        case _ => 0
      }
      assert(n > 100, s"$path queries truncated ($n)")
    }
  }

  test("artifact write: non-empty on a trip, {} all-clear, and parseable") {
    val dir = java.nio.file.Files.createTempDirectory("tripwire")
    val p = dir.resolve("_bench_failures.json").toString
    Bench.writeTripwire(p, Bench.tripwire(Map("m2_lsh" -> 1.6), baseline))
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(p)).trim
      == """{"m2_lsh":3.20}""")
    Bench.writeTripwire(p, Bench.tripwire(Map("m2_lsh" -> 0.4), baseline))
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(p)).trim == "{}")
  }
}
