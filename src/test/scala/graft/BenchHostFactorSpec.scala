package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12: the bench's host-factor canary thresholding, tested as
  * pure functions with a synthetic slow host. Two driver rounds in a
  * row (r10 1.05×, r11 1.20×) were dominated by uniform host
  * inflation whose only defense was after-the-fact adjudication
  * prose; [[Bench.hostFactor]] measures the day's speed from a
  * five-query canary pass and [[Bench.isSuspect]] scales the suspect
  * bar by it, so a uniformly slow day stops flooding the record with
  * storm-pattern flags while a genuine single-query regression still
  * fires. */
class BenchHostFactorSpec extends AnyFunSuite {

  private val seed = Map("a" -> 0.4, "b" -> 0.1, "c" -> 0.5)

  test("hostFactor is 1.0 on a matching or fast host (floored)") {
    assert(Bench.hostFactor(seed, seed) == 1.0)
    // a FAST host must not tighten the bar below design
    val fast = seed.view.mapValues(_ * 0.5).toMap
    assert(Bench.hostFactor(fast, seed) == 1.0)
  }

  test("hostFactor measures uniform inflation from the canary sums") {
    val slow = seed.view.mapValues(_ * 1.8).toMap
    assert(math.abs(Bench.hostFactor(slow, seed) - 1.8) < 1e-9)
  }

  test("hostFactor is neutral without overlap or with degenerate seeds") {
    assert(Bench.hostFactor(Map("x" -> 1.0), seed) == 1.0)
    assert(Bench.hostFactor(Map.empty, seed) == 1.0)
    assert(Bench.hostFactor(seed, Map.empty) == 1.0)
    // zero/negative entries are dropped, not divided by
    assert(Bench.hostFactor(Map("a" -> 1.0), Map("a" -> 0.0)) == 1.0)
  }

  test("synthetic slow host: uniform 2x inflation stops flagging, " +
    "a real 10x regression still fires") {
    val prior = Some(2.0)
    val hfSlow = Bench.hostFactor(
      seed.view.mapValues(_ * 2.0).toMap, seed) // measured 2.0
    // r11 failure mode: query at 2.5-3.5x prior on a slow day.
    // Absolute 3x bar flags it; the host-scaled 6x bar does not.
    assert(Bench.isSuspect(7.0, prior, 3.0, 1.0))
    assert(!Bench.isSuspect(7.0, prior, 3.0, hfSlow))
    // a genuine regression (10x prior) fires even at host factor 2
    assert(Bench.isSuspect(20.5, prior, 3.0, hfSlow))
  }

  test("isSuspect keeps the +1s absolute floor and clamps hf below 1") {
    // sub-second JIT noise never fires even at huge ratios
    assert(!Bench.isSuspect(0.9, Some(0.1), 3.0, 1.0))
    // hf < 1 must clamp to 1, not tighten the bar
    assert(Bench.isSuspect(7.0, Some(2.0), 3.0, 0.25) ==
      Bench.isSuspect(7.0, Some(2.0), 3.0, 1.0))
    // no prior -> never suspect
    assert(!Bench.isSuspect(100.0, None, 3.0, 1.0))
  }

  test("canary set is stable, cheap, and all registered") {
    assert(Bench.canaryNames.size == 5)
    assert(Bench.canaryNames.distinct.size == 5)
    Bench.canaryNames.foreach { n =>
      assert(SparkEntry.queries.contains(n), s"canary $n not registered")
    }
  }
}
