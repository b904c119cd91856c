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
    assert(!Bench.gateRerun(subsetRun = true, ratio = 0.5, attempt = 1,
      floorRatio = 10.0))
  }

  test("floor-probe inflation gates even when the row recheck is quiet " +
      "(the mid-board-load mode), within the same attempt budget") {
    // the round-10 discarded board's shape: recheck_ratio 0.67, floor 3×
    assert(Bench.gateRerun(subsetRun = false, ratio = 0.67, attempt = 1,
      floorRatio = 3.0))
    assert(!Bench.gateRerun(subsetRun = false, ratio = 0.67,
      attempt = Bench.MaxBoardAttempts, floorRatio = 3.0))
    // boundary: the bound itself is trusted, strictly-above gates
    assert(!Bench.gateRerun(subsetRun = false, ratio = 0.67, attempt = 1,
      floorRatio = Bench.FloorBound))
    assert(Bench.gateRerun(subsetRun = false, ratio = 0.67, attempt = 1,
      floorRatio = Bench.FloorBound + 1e-9))
    // either signal alone suffices
    assert(Bench.gateRerun(subsetRun = false, ratio = 2.0, attempt = 1,
      floorRatio = 1.0))
  }
}
