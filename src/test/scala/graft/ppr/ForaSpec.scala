package graft.ppr

import graft.SparkSpec
import graft.graph.GraphOps

class ForaSpec extends SparkSpec {

  private def edgesDf = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 1L), (4L, 1L), (3L, 4L))
      .toDF("src", "dst")
  }

  test("whole-graph FORA is deterministic and near ground truth") {
    val csr = GraphOps.buildCsr(edgesDf)
    val conf = Fora.Conf(alpha = 0.15, epsilon = 0.3, seed = 42L)
    val a = Fora.wholeGraphLocal(csr, csr.denseOf(1L), conf)
    val b = Fora.wholeGraphLocal(csr, csr.denseOf(1L), conf)
    assert(a.sameElements(b))
    val exact = PowerIteration.runLocal(csr, csr.denseOf(1L), 0.15, 500)
    val maxErr = (0 until csr.numNodes)
      .map(v => math.abs(exact(v) - a(v))).max
    assert(maxErr < 0.05, s"maxErr=$maxErr")
    // FORA preserves total mass: reserve + walk credits sum to ~1.
    assert(math.abs(a.sum - 1.0) < 1e-9)
  }

  test("top-k FORA recovers the true top-k on a small graph") {
    val csr = GraphOps.buildCsr(edgesDf)
    val k = 3
    val scores = Fora.topkLocal(csr, csr.denseOf(1L), k,
      Fora.Conf(alpha = 0.15, epsilon = 0.5, seed = 42L))
    val exact = PowerIteration.runLocal(csr, csr.denseOf(1L), 0.15, 500)
    val trueTop = (0 until csr.numNodes).sortBy(v => -exact(v)).take(k).toSet
    val kth = Fora.kthLargest(scores, k)
    val estTop = (0 until csr.numNodes).filter(v => scores(v) >= kth && scores(v) > 0).toSet
    assert((trueTop intersect estTop).size >= k - 1,
      s"true=$trueTop est=$estTop")
  }

  test("degenerate source (outdeg 0) short-circuits to itself") {
    val s = spark
    import s.implicits._
    val e = Seq((2L, 1L), (3L, 2L)).toDF("src", "dst")
    val csr = GraphOps.buildCsr(e)
    val scores = Fora.topkLocal(csr, csr.denseOf(1L), 2, Fora.Conf())
    assert(scores(csr.denseOf(1L)) == 1.0)
    assert(scores.sum == 1.0)
  }

  test("wholeGraphTrace recomposes to wholeGraphLocal's scores") {
    val csr = GraphOps.buildCsr(edgesDf)
    val conf = Fora.Conf(alpha = 0.15, epsilon = 0.3, seed = 42L)
    val direct = Fora.wholeGraphLocal(csr, csr.denseOf(1L), conf)
    val t = Fora.wholeGraphTrace(csr, csr.denseOf(1L), conf)
    // recompose exactly as the replay SQL does: reserve (+ α-fold when
    // walks ran) + per-walk credit a_v/ω·rsum, same expression chain.
    val rec = t.reserve.clone()
    if (t.numWalks > 0) {
      for (v <- 0 until csr.numNodes; r = t.residue(v); if r != 0.0)
        rec(v) += conf.alpha * r
      for ((vOrig, dOrig) <- t.walks) {
        val r = t.residue(csr.denseOf(vOrig))
        val rc = (1.0 - conf.alpha) * r
        val omegaI = math.ceil(rc / t.rsum * t.numWalks).toLong
        rec(csr.denseOf(dOrig)) += rc / t.rsum * t.numWalks / omegaI / t.numWalks * t.rsum
      }
    }
    val maxDiff = (0 until csr.numNodes)
      .map(v => math.abs(rec(v) - direct(v))).max
    assert(maxDiff < 1e-12, s"trace recomposition drifted: $maxDiff")
  }

  test("topkTrace recomposes to topkLocal's terminating estimate cut") {
    val csr = GraphOps.buildCsr(edgesDf)
    val k = 3
    val conf = Fora.Conf(alpha = 0.15, epsilon = 0.5, seed = 42L)
    val direct = Fora.topkLocal(csr, csr.denseOf(1L), k, conf)
    val t = Fora.topkTrace(csr, csr.denseOf(1L), k, conf)
    val rec = t.reserve.clone()
    if (t.numWalks > 0)
      for ((vOrig, dOrig) <- t.walks) {
        val r = t.residue(csr.denseOf(vOrig))
        val omegaI = math.ceil(r * t.numWalks).toLong
        rec(csr.denseOf(dOrig)) += r / omegaI
      }
    val maxDiff = (0 until csr.numNodes)
      .map(v => math.abs(rec(v) - direct(v))).max
    assert(maxDiff < 1e-12, s"trace recomposition drifted: $maxDiff")
  }

  test("batch APIs emit one vector per source") {
    val csr = GraphOps.buildCsr(edgesDf)
    val whole = Fora.batch(spark, csr, Seq(1L, 2L), Fora.Conf(epsilon = 0.5))
    assert(whole.select("src").distinct().count() == 2)
    val topk = Fora.topkBatch(spark, csr, Seq(1L, 2L), 2, Fora.Conf(epsilon = 0.5))
    val perSrc = topk.groupBy("src").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perSrc.values.forall(_ >= 2)) // tie-inclusive ≥ k when ≥k nonzero
  }
}
