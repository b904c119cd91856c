package graft.queries

import graft.SparkSpec
import graft.graph.GraphOps

class ModularitySpec extends SparkSpec {

  test("g_modularity matches brute-force Newman Q over the LPA labels " +
      "and its integer moments") {
    val r = Graph.queries("g_modularity")(spark, sfDir).collect()(0)

    val e = GraphOps.lineitemSubgraph(spark, sfDir, Graph.CcMod, Graph.CcQtyMax)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val und = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val labels = Graph.queries("g_label_prop")(spark, sfDir).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap

    val m2 = und.length.toLong
    val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val sIntra = und.count { case (u, v) => labels(u) == labels(v) }.toLong
    val sDd = deg.toSeq.groupBy { case (id, _) => labels(id) }
      .values.map(_.map(_._2).sum).map(dc => dc * dc).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((m2, sIntra, sDd)))

    val want = (m2 * sIntra - sDd).toDouble / (m2 * m2).toDouble
    assert(r.getDouble(3) == want) // exact integer operands → same double
    // Newman bounds: Q ∈ [-1/2, 1); LPA on the fragmented subgraph must
    // find genuinely assortative structure, not the trivial Q ≈ 0
    assert(want > 0.0 && want < 1.0)

    // range honesty (the scaladoc's 2⁶³ headroom), BigInt-exact
    assert(BigInt(m2) * BigInt(sIntra) < (BigInt(1) << 62))
    assert(BigInt(m2) * BigInt(m2) < (BigInt(1) << 62))
  }

  test("the shared LPA fit serves both rows: g_modularity == the " +
      "standalone uncached modularityRun, and invalidation refits to " +
      "the same labels and Q") {
    val sc = spark.sparkContext
    val lab0 = Graph.queries("g_label_prop")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // triggers the fit
    val q0 = Graph.queries("g_modularity")(spark, sfDir).collect()(0)
    // fresh end-to-end run, bypassing the session fit — the row's
    // previous body
    val direct = Graph.modularityRun(spark,
      GraphOps.lineitemSubgraph(spark, sfDir, Graph.CcMod, Graph.CcQtyMax),
      Graph.LpRounds).collect()(0)
    assert((0 to 2).forall(i => direct.getLong(i) == q0.getLong(i)))
    assert(java.lang.Double.doubleToLongBits(direct.getDouble(3)) ==
      java.lang.Double.doubleToLongBits(q0.getDouble(3)))
    // re-ingest contract: unpin + refit from source, same answer
    val pinned0 = graft.operators.SessionPins.pinned(sc)
    Graph.invalidateModels(spark, sfDir)
    assert(graft.operators.SessionPins.pinned(sc).size < pinned0.size,
      "invalidation must unpin the shared label-frame checkpoint")
    val lab1 = Graph.queries("g_label_prop")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab1 == lab0)
    val q1 = Graph.queries("g_modularity")(spark, sfDir).collect()(0)
    assert((0 to 2).forall(i => q1.getLong(i) == q0.getLong(i)))
    assert(java.lang.Double.doubleToLongBits(q1.getDouble(3)) ==
      java.lang.Double.doubleToLongBits(q0.getDouble(3)))
  }
}
