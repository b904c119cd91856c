package graft.graph

import graft.SparkSpec
import graft.queries.Graph

class BfsSpec extends SparkSpec {

  test("distances on a toy digraph, depth cutoff respected") {
    val s = spark
    import s.implicits._
    // 1→2→3→4→5 chain plus shortcut 1→4; 9 is disconnected from 1.
    val csr = Csr.fromEdges(Array((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (1L, 4L), (9L, 1L)))
    val got = Bfs.batch(spark, csr, Seq(1L, 9L), maxDepth = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == Map(
      (1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 4L) -> 1, // shortcut beats chain
      (1L, 3L) -> 2, (1L, 5L) -> 2,                // via the shortcut
      (9L, 9L) -> 0, (9L, 1L) -> 1, (9L, 2L) -> 2, (9L, 4L) -> 2))
    // absent source → no rows
    assert(Bfs.batch(spark, csr, Seq(42L), 3).count() == 0)
  }

  test("batch CSR and superstep regimes are exactly equal on the bench " +
      "graph and on the toy digraph (two-regime contract)") {
    val s = spark
    import s.implicits._
    val edges = GraphOps.lineitemGraph(spark, sfDir, Graph.Mod)
    val batch = Bfs
      .batch(spark, GraphOps.buildCsr(edges), Graph.BatchSources,
        Graph.BfsDepth)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val sup = Bfs
      .runSupersteps(spark, edges, Graph.BatchSources, Graph.BfsDepth)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(sup == batch)
    // toy: absent source drops out, shortcut wins, depth cutoff respected
    val toy = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (9L, 1L)).toDF("src", "dst")
    val got = Bfs.runSupersteps(spark, toy, Seq(1L, 9L, 42L), 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == Map(
      (1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 4L) -> 1,
      (1L, 3L) -> 2, (1L, 5L) -> 2,
      (9L, 9L) -> 0, (9L, 1L) -> 1, (9L, 2L) -> 2, (9L, 4L) -> 2))
  }

  test("dist-1 / dist<=2 counts agree with g_khop at sf0.001") {
    val bfs = Graph.queries("g_bfs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val khop = Graph.queries("g_khop")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    khop.foreach { case (s, (nHop1, nWithin2)) =>
      val d1 = bfs.count(t => t._1 == s && t._3 == 1)
      // g_khop's within-2 set excludes the source itself
      val d12 = bfs.count(t => t._1 == s && t._3 >= 1 && t._3 <= 2 && t._2 != s)
      assert(d1.toLong == nHop1, s"source $s hop1")
      assert(d12.toLong == nWithin2, s"source $s within2")
    }
  }
}
