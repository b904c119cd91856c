package graft.harness

import org.scalatest.funsuite.AnyFunSuite

/** Pins every dataset grid to the reference's parameter arrays
  * (`Gen_Util.java:334-478`): Testset1 BlogCatalog, Testset2 Flickr,
  * Testset3 GR-QC, Testset4 Com-Amazon (all dormant — datasets not
  * shipped), Testset5 GOT (the active fixture). No Spark session needed —
  * grids are pure data.
  */
class GridsSpec extends AnyFunSuite {

  test("GOT grid matches Testset5 (Gen_Util.java:451-478)") {
    val g = Grids.Got
    assert(g.wholeGraph.params("FORA_WHOLE_GRAPH") == Seq(10.0, 5.0, 0.5, 0.1, 0.05))
    assert(g.wholeGraph.params("FWDPUSH") == Seq(1.0e-4, 1.0e-5, 1.0e-6, 1.0e-7, 1.0e-8))
    assert(g.wholeGraph.params("LIBRARY") == Seq(5, 40, 100, 200, 300))
    assert(g.wholeGraph.params("MC") == Seq(1.0, 0.5, 0.3, 0.1, 0.05))
    assert(g.wholeGraph.baseThresholds == Seq(0.001, 5.0e-4, 5.0e-5, 1.0e-6, 5.0e-7))
    assert(g.topk.params("FORA_TOPK") == Seq(10.0, 5.0, 0.5, 0.1, 0.05))
    assert(g.prep == g.wholeGraph) // Testset5 prep reuses the whole-graph arrays
  }

  test("BlogCatalog grid matches Testset1 (Gen_Util.java:334-362)") {
    val g = Grids.BlogCatalog
    assert(g.wholeGraph.params("FORA_WHOLE_GRAPH") == Seq(50.0, 10.0, 5.0, 1.0, 0.5))
    assert(g.wholeGraph.params("FWDPUSH") == Seq(1.0e-6, 7.0e-7, 5.0e-7, 3.0e-7, 1.0e-7))
    assert(g.wholeGraph.params("LIBRARY") == Seq(1, 5, 10, 40, 100))
    assert(g.wholeGraph.params("MC") == Seq(5.0, 1.0, 0.7, 0.5, 0.3))
    assert(g.wholeGraph.baseThresholds == Seq(0.001, 7.0e-4, 5.0e-4, 1.0e-4, 5.0e-5))
    assert(g.topk.params("FORA_TOPK") == Seq(1.0, 0.5, 0.1, 0.05, 0.01))
    assert(g.topk.params("FWDPUSH") == Seq(1.0e-6, 5.0e-7, 1.0e-7, 5.0e-8, 1.0e-8))
    assert(g.topk.params("MC") == Seq(5.0, 1.0, 0.5, 0.1, 0.05))
    assert(g.prep.params == g.wholeGraph.params) // Testset1 prep = whole-graph arrays
  }

  test("Flickr grid matches Testset2 (Gen_Util.java:364-389)") {
    val g = Grids.Flickr
    assert(g.wholeGraph.params("FORA_WHOLE_GRAPH") ==
      Seq(500.0, 50.0, 10.0, 5.0, 3.0, 1.0, 0.5)) // 7-point FORA sweep
    assert(g.wholeGraph.params("FWDPUSH") == Seq(5.0e-5, 1.0e-6, 5.0e-8, 1.0e-8, 5.0e-9))
    assert(g.wholeGraph.baseThresholds == Seq(0.005, 0.001, 5.0e-4, 1.0e-4, 7.0e-5))
    assert(g.topk.params("LIBRARY") == Seq(5, 10, 40, 100, 200))
    assert(g.topk.baseThresholds == Seq(5.0e-4, 3.0e-4, 1.0e-4, 7.0e-5, 5.0e-5))
    assert(g.prep.params("FORA_WHOLE_GRAPH") == Seq(500.0, 200.0, 100.0, 20.0, 10.0))
    assert(g.prep.baseThresholds.length == 10) // the reference's 10-point BASE sweep
    assert(g.prep.baseThresholds == Seq(0.01, 0.005, 0.001, 7.0e-4, 5.0e-4,
      1.0e-4, 7.0e-5, 5.0e-5, 3.0e-5, 1.0e-5))
  }

  test("GR-QC grid matches Testset3 (Gen_Util.java:391-419)") {
    val g = Grids.Grqc
    // whole-graph arrays coincide with GOT's (the reference reused them)
    assert(g.wholeGraph == Grids.Got.wholeGraph)
    assert(g.topk.params("FORA_TOPK") == Seq(10.0, 0.5, 0.1, 0.01, 0.001))
    assert(g.topk.params("FWDPUSH") == Seq(1.0e-4, 1.0e-6, 5.0e-8, 7.0e-9, 7.0e-10))
    assert(g.topk.params("LIBRARY") == Seq(5, 40, 300, 500, 1000))
    assert(g.topk.baseThresholds == Seq(0.001, 5.0e-4, 5.0e-5, 1.0e-7, 5.0e-8))
    assert(g.prep.params("FORA_WHOLE_GRAPH") == Seq(10.0, 5.0, 0.5, 0.3, 0.1))
    assert(g.prep.params("MC") == Seq(1.0, 0.5, 0.3, 0.2, 0.1))
  }

  test("Com-Amazon grid matches Testset4 (Gen_Util.java:421-449)") {
    val g = Grids.ComAmazon
    assert(g.wholeGraph.params("FORA_WHOLE_GRAPH") == Seq(50.0, 10.0, 5.0, 3.0, 1.0))
    assert(g.wholeGraph.baseThresholds == Seq(1.0e-4, 5.0e-5, 4.0e-5, 3.0e-5, 2.0e-5))
    assert(g.topk.baseThresholds == Seq(1.0e-3, 5.0e-4, 1.0e-4, 5.0e-5)) // 4 points
    // NON-monotonic on purpose: the reference's rmax_arr_prep is literally
    // {1.0E-5, 5.0E-5, 1.0E-6, 5.0E-7, 3.0E-7} (Gen_Util.java:446) — the
    // only non-descending FWDPUSH array in any testset; pinned verbatim so
    // a well-meaning "fix" of the ordering fails here.
    assert(g.prep.params("FWDPUSH") == Seq(1.0e-5, 5.0e-5, 1.0e-6, 5.0e-7, 3.0e-7))
    assert(g.prep.params("LIBRARY") == Seq(1)) // iteration_arr_prep = {1}
    assert(g.prep.baseThresholds.isEmpty) // threshold_arr_base_prep = {}
  }

  test("byName resolves every grid and rejects unknowns") {
    assert(Grids.byName("blogcatalog") == Grids.BlogCatalog)
    assert(Grids.byName("flickr") == Grids.Flickr)
    assert(Grids.byName("grqc") == Grids.Grqc)
    assert(Grids.byName("amazon") == Grids.ComAmazon)
    intercept[IllegalArgumentException](Grids.byName("got2"))
  }
}
