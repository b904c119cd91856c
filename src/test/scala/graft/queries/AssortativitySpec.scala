package graft.queries

import graft.SparkSpec
import graft.graph.GraphOps

class AssortativitySpec extends SparkSpec {

  test("g_assortativity matches the brute-force Newman r and its " +
      "integer moments") {
    val r = Graph.queries("g_assortativity")(spark, sfDir).collect()(0)

    val und = GraphOps.lineitemGraph(spark, sfDir, Graph.TriMod).collect()
      .map(x => (math.min(x.getLong(0), x.getLong(1)),
        math.max(x.getLong(0), x.getLong(1)))).distinct
    val pairs = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m = pairs.length.toLong
    val sJk = pairs.map { case (u, v) => deg(u) * deg(v) }.sum
    val sJ = pairs.map { case (u, _) => deg(u) }.sum
    val sJj = pairs.map { case (u, _) => deg(u) * deg(u) }.sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((m, sJk, sJ, sJj)))
    val want = (m * sJk - sJ * sJ).toDouble / (m * sJj - sJ * sJ).toDouble
    assert(r.getDouble(4) == want) // same exact integer operands → same double
    assert(want >= -1.0 && want <= 1.0)
  }
}
