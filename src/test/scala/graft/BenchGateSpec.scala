package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench contamination gate's decision table (README "Reading a
  * bench artifact"): full boards past the ratio bound re-run while
  * attempts remain; subset runs never gate; a clean ratio never gates.
  */
class BenchGateSpec extends AnyFunSuite {

  test("contaminated full board re-runs until attempts are exhausted") {
    assert(Bench.gateRerun(subsetRun = false, ratio = 3.1, attempt = 1))
    assert(!Bench.gateRerun(subsetRun = false, ratio = 3.1,
      attempt = Bench.MaxBoardAttempts))
  }

  test("quiet boards and boundary ratios never re-run") {
    assert(!Bench.gateRerun(subsetRun = false, ratio = 0.95, attempt = 1))
    // the bound itself is trusted (README: "≲ 1.3"), strictly-above gates
    assert(!Bench.gateRerun(subsetRun = false, ratio = Bench.RecheckBound,
      attempt = 1))
    assert(Bench.gateRerun(subsetRun = false,
      ratio = Bench.RecheckBound + 1e-9, attempt = 1))
  }

  test("subset runs never gate regardless of ratio") {
    assert(!Bench.gateRerun(subsetRun = true, ratio = 10.0, attempt = 1))
  }
}
