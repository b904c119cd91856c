package graft.graph

import graft.SparkSpec
import graft.queries.Graph

class KatzSpec extends SparkSpec {

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def brute(edges: Seq[(Long, Long)], alpha: Double,
      iters: Int): Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var x = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters)
      x = nodes.map { v =>
        v -> (1.0 + in.getOrElse(v, Nil).map(u => x(u) * alpha).sum)
      }.toMap
    x
  }

  test("g_katz matches the driver recurrence on the bench graph at 9dp " +
      "and every score is >= 1 (the β floor)") {
    val got = Graph.queries("g_katz")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val edges = GraphOps.lineitemGraph(spark, sfDir, Graph.Mod).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = brute(edges, Graph.KatzAlpha, Graph.KatzIters)
      .view.mapValues(round9).toMap
    assert(got.keySet == want.keySet)
    // driver sums fold in adjacency order, Spark partials in partition
    // order — scores must agree through round-9 up to one last-ulp
    // boundary flip, which the bench graphs stay clear of (the
    // g_pagerank precedent); compare exactly.
    assert(got == want)
    got.values.foreach(v => assert(v >= 1.0))
  }

  test("batchAlphasLocal ≡ the distributed Katz.run at the rows' 9-dp " +
      "rounding, for every got_grid_katz alpha in one job") {
    val edges = Got.edges(spark)
    val batch = Katz.batchAlphasLocal(spark, Got.cachedCsr(spark),
        graft.queries.GotQueries.GridKatzAlphas,
        graft.queries.GotQueries.GridKatzIters)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1)) -> round9(r.getDouble(2)))
      .toMap
    val want = graft.queries.GotQueries.GridKatzAlphas.flatMap { a =>
      Katz.run(spark, edges, a, graft.queries.GotQueries.GridKatzIters)
        .collect()
        .map(r => (a, r.getLong(0)) -> round9(r.getDouble(1)))
    }.toMap
    assert(batch == want,
      "the dense per-α task must reproduce the superstep loop exactly " +
        "through the 9-dp rounding both engines compare at")
  }

  test("katz attenuation: on a directed path a->b->c the closed form " +
      "holds and deeper walks carry alpha^2") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val a = 0.5
    val got = Katz.run(spark, e, a, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // x(a) = 1; x(b) = 1 + α; x(c) = 1 + α + α² (truncation converged:
    // the longest walk is length 2, shorter than the horizon)
    assert(got(1L) == 1.0)
    assert(got(2L) == 1.0 + a)
    assert(got(3L) == 1.0 + a + a * a)
  }
}
