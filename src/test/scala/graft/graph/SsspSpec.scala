package graft.graph

import graft.SparkSpec
import graft.queries.Graph

class SsspSpec extends SparkSpec {

  test("bounded-hop min-plus distances on a toy weighted digraph") {
    val s = spark
    import s.implicits._
    // 1→2 (1.0) →3 (1.0): cost 2 over 2 hops; direct 1→3 costs 5.0.
    // 3→4 only reachable within 3 hops via the cheap chain.
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0),
      (3L, 4L, 1.0)).toDF("src", "dst", "w")
    val g = Sssp.buildWeighted(edges)
    val got2 = Sssp.batch(spark, g, Seq(1L), maxHops = 2).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // chain beats direct for 3; 4 only via the expensive direct edge yet
    assert(got2 == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0, 4L -> 6.0))
    val got1 = Sssp.batch(spark, g, Seq(1L), maxHops = 1).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got1 == Map(1L -> 0.0, 2L -> 1.0, 3L -> 5.0)) // only the direct edge
    val got3 = Sssp.batch(spark, g, Seq(1L), maxHops = 3).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got3(4L) == 3.0)
  }

  test("batch and superstep regimes are EXACTLY equal on the bench " +
      "weighted graph and on the toy (bit-identical doubles)") {
    val s = spark
    import s.implicits._
    val edges = GraphOps.lineitemWeightedGraph(spark, sfDir, Graph.Mod)
    val batch = Sssp
      .batch(spark, Sssp.buildWeighted(edges), Graph.BatchSources,
        Graph.SsspHops)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val sup = Sssp
      .runSupersteps(spark, edges, Graph.BatchSources, Graph.SsspHops)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(sup == batch)
    // toy: the round-r min-plus value must match the synchronous batch
    // schedule exactly at every hop bound (the frontier optimization
    // cannot change round-r semantics)
    val toy = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0),
      (3L, 4L, 1.0)).toDF("src", "dst", "w")
    for (hops <- 1 to 3) {
      val b = Sssp.batch(spark, Sssp.buildWeighted(toy), Seq(1L), hops)
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
      val p = Sssp.runSupersteps(spark, toy, Seq(1L), hops)
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
      assert(p == b, s"hops=$hops")
    }
  }

  test("weighted distances dominate BFS hop counts at sf0.001") {
    // same (src, dst) edge set, weights >= 1: any path's cost is at least
    // its hop count, so dist_sssp(v) >= dist_bfs(v), and every BFS-reached
    // node (depth 4) is SSSP-reached (hop bound 6).
    val sssp = Graph.queries("g_sssp")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bfs = Graph.queries("g_bfs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(bfs.nonEmpty && bfs.keySet.subsetOf(sssp.keySet))
    bfs.foreach { case (k, d) =>
      assert(sssp(k) >= d.toDouble, s"$k: sssp ${sssp(k)} < bfs $d")
    }
  }
}
