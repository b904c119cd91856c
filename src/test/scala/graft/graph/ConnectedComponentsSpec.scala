package graft.graph

import graft.SparkSpec
import graft.queries.Graph
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {

  private def toyEdges = {
    val s = spark
    import s.implicits._
    // two components {1,2,3,4} (a path — worst case for plain min-prop)
    // and {10, 11}, plus a directed arc 4→1 that must symmetrize.
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (10L, 11L))
      .toDF("src", "dst")
  }

  test("labels a path graph and an island with their component minima") {
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)
    // both regimes on the same toy graph
    val local = ConnectedComponents.run(spark, toyEdges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == want)
    val ss = ConnectedComponents.runSupersteps(spark, toyEdges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ss == want)
  }

  test("shipped round count has converged on the benchmark subgraph") {
    val edges = GraphOps.lineitemSubgraph(
      spark, sfDir, Graph.CcMod, Graph.CcQtyMax)
    val atK = ConnectedComponents.runSupersteps(spark, edges, Graph.CcRounds)
    val beyond = ConnectedComponents.runSupersteps(
      spark, edges, Graph.CcRounds + 2)
    // fixpoint: two extra rounds change nothing
    assert(atK.exceptAll(beyond).isEmpty && beyond.exceptAll(atK).isEmpty)
  }

  test("superstep and union-find regimes agree at sf0.001") {
    val edges = GraphOps.lineitemSubgraph(
      spark, sfDir, Graph.CcMod, Graph.CcQtyMax)
    val ss = ConnectedComponents.runSupersteps(spark, edges, Graph.CcRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uf = ConnectedComponents.run(spark, edges, Graph.CcRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ss == uf)
    // and the structure is genuinely non-trivial: many components
    assert(uf.values.toSet.size > 10)
  }
}
