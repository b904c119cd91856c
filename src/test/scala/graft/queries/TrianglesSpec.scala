package graft.queries

import graft.SparkSpec
import graft.graph.GraphOps

class TrianglesSpec extends SparkSpec {

  test("degree-ordered triangle counts match brute force on the bench graph") {
    val got = Graph.queries("g_triangles")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute force: undirected adjacency sets, count closed wedges a<b<c.
    val und = GraphOps.lineitemGraph(spark, sfDir, Graph.TriMod).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))))
      .distinct
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- und; c <- adj(a) intersect adj(b); if b < c) {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    assert(counts.nonEmpty, "bench graph must contain triangles")
    assert(got == counts.toMap, s"got ${got.size} nodes vs brute ${counts.size}")
  }

  test("g_local_cc: brute-force per-node coefficients with both zero " +
      "branches live at verify scale") {
    import graft.graph.GraphOps
    val got = Graph.queries("g_local_cc")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val und = GraphOps.lineitemGraph(spark, sfDir, Graph.TriMod).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).distinct
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == adj.keySet)
    adj.foreach { case (v, ns) =>
      val dg = ns.size.toLong
      val t = ns.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x)(y) }.toLong
      val cc = if (dg >= 2) 2.0 * t / (dg * (dg - 1)).toDouble else 0.0
      assert(got(v) == ((dg, t, cc)), s"node $v")
    }
    assert(got.values.exists(_._3 > 0.0) && got.values.exists(_._2 == 0L))
  }
}
