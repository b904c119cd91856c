package graft.graph

import graft.SparkSpec
import graft.queries.Graph

class SccSpec extends SparkSpec {

  private def toDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("both regimes agree on a toy graph with known SCCs") {
    // two 3-cycles bridged one-way, a 2-cycle, and a DAG tail:
    //   {1,2,3} -> {4,5,6} -> 7 -> 8 ; {10,11} mutual
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1),
      (3, 4),
      (4, 5), (5, 6), (6, 4),
      (6, 7), (7, 8),
      (10, 11), (11, 10))
    val want = Map[Long, Long](
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L,
      7L -> 7L, 8L -> 8L,
      10L -> 10L, 11L -> 10L)
    assert(labelsOf(Scc.runLocal(spark, toDf(edges))) == want)
    assert(labelsOf(Scc.runSupersteps(spark, toDf(edges), 6, 6)) == want)
  }

  test("a long cycle and an acyclic chain exercise the convergence " +
      "budgets honestly") {
    // an 8-cycle needs full forward propagation; the chain is all
    // singletons peeled by trimming
    val cyc = (0L until 8L).map(i => (i, (i + 1) % 8))
    val chain = Seq[(Long, Long)]((20, 21), (21, 22), (22, 23))
    val edges = cyc ++ chain
    val want = (0L until 8L).map(_ -> 0L).toMap ++
      Map(20L -> 20L, 21L -> 21L, 22L -> 22L, 23L -> 23L)
    assert(labelsOf(Scc.runLocal(spark, toDf(edges))) == want)
    assert(labelsOf(Scc.runSupersteps(spark, toDf(edges), 9, 6)) == want)
    // an insufficient color budget must FAIL LOUDLY, never mislabel
    intercept[IllegalArgumentException] {
      Scc.runSupersteps(spark, toDf(cyc), 3, 6).collect()
    }
  }

  test("g_scc on the bench graph: the distributed coloring loop equals " +
      "the Tarjan path and the structure is non-trivial") {
    val e = GraphOps.lineitemSubgraph(spark, sfDir, Graph.Mod,
      Graph.SccQtyMax).localCheckpoint(true)
    val local = labelsOf(Scc.runLocal(spark, e))
    val dist = labelsOf(
      Scc.runSupersteps(spark, e, Graph.SccFwdSteps, Graph.SccOuterRounds))
    assert(local == dist)
    // the row dispatches to the local regime at this size — same answer
    val row = labelsOf(Graph.queries("g_scc")(spark, sfDir))
    assert(row == local)
    // sf0.001 structure: a real mix of non-trivial SCCs and singletons
    val sizes = local.groupBy(_._2).map(_._2.size)
    assert(sizes.exists(_ >= 2) && sizes.count(_ == 1) > 100)
    // every label is the minimum member of its class
    local.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.keys.min == comp)
    }
  }
}
