package graft.queries

import graft.SparkSpec
import graft.graph.GraphOps

class ClusteringSpec extends SparkSpec {

  test("g_clustering matches brute-force transitivity and its integer " +
      "moments, and T agrees with g_triangles") {
    val r = Graph.queries("g_clustering")(spark, sfDir).collect()(0)

    val und = GraphOps.lineitemGraph(spark, sfDir, Graph.TriMod).collect()
      .map(x => (math.min(x.getLong(0), x.getLong(1)),
        math.max(x.getLong(0), x.getLong(1)))).distinct
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edgeSet = und.toSet
    // brute-force: every unordered neighbor pair of every center is a
    // wedge; closed iff the pair is an edge
    val nTri = adj.iterator.map { case (_, ns) =>
      val s = ns.toSeq.sorted
      s.combinations(2).count(p =>
        edgeSet.contains((p(0), p(1)))).toLong
    }.sum / 3 // each triangle closes at 3 centers
    val sDeg2 = adj.valuesIterator.map(ns =>
      ns.size.toLong * (ns.size - 1)).sum
    assert((r.getLong(0), r.getLong(1)) == ((nTri, sDeg2)))

    val want = (6 * nTri).toDouble / sDeg2.toDouble
    assert(r.getDouble(2) == want) // exact integer operands → same double
    assert(want > 0.0 && want <= 1.0)

    // the scalar's T must equal the per-node row's total/3 — the two
    // rows share a pipeline and may not drift apart
    val perNode = Graph.queries("g_triangles")(spark, sfDir).collect()
      .map(_.getLong(1)).sum
    assert(perNode == 3 * nTri)
  }
}
