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

  test("per-row floor sampling gates a mid-board transient both " +
      "bracketing probes miss, and floorHotFrac is robust") {
    // the observed 306 s board: recheck 0.68, floor_ratio 0.99, but a
    // multi-row window of ≥3× probes mid-board
    assert(Bench.gateRerun(subsetRun = false, ratio = 0.68, attempt = 1,
      floorRatio = 0.99, floorHotFrac = 0.3))
    assert(!Bench.gateRerun(subsetRun = false, ratio = 0.68, attempt = 1,
      floorRatio = 0.99, floorHotFrac = Bench.FloorHotFracBound))
    // quiet board: uniform probes, zero hot fraction
    val quiet = Seq.fill(100)(0.08) ++ Seq(0.09, 0.1, 0.07)
    assert(Bench.floorHotFrac(quiet) == 0.0)
    // one isolated scheduler hiccup on a quiet box stays under the bound
    val hiccup = Seq.fill(99)(0.08) :+ 0.5
    assert(Bench.floorHotFrac(hiccup) <= Bench.FloorHotFracBound)
    // a 30-row interference window at 4× trips it
    val transient = Seq.fill(100)(0.08) ++ Seq.fill(30)(0.32)
    assert(Bench.floorHotFrac(transient) > Bench.FloorHotFracBound)
    assert(Bench.floorHotFrac(Nil) == 0.0)
  }
}
