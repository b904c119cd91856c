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
    val got = ConnectedComponents.run(spark, toyEdges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("shipped round count has converged on the benchmark subgraph") {
    val edges = GraphOps.lineitemSubgraph(
      spark, sfDir, Graph.CcMod, Graph.CcQtyMax)
    val atK = ConnectedComponents.run(spark, edges, Graph.CcRounds)
    val beyond = ConnectedComponents.run(spark, edges, Graph.CcRounds + 2)
    // fixpoint: two extra rounds change nothing
    assert(atK.exceptAll(beyond).isEmpty && beyond.exceptAll(atK).isEmpty)
  }

  test("matches union-find ground truth at sf0.001") {
    val edges = GraphOps.lineitemSubgraph(
      spark, sfDir, Graph.CcMod, Graph.CcQtyMax)
    val pairs = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find over the same edge list
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical: every node labeled by the min node id of its root class
    val byRoot = parent.keys.toSeq.groupBy(find)
    val want = byRoot.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }.toMap
    val got = ConnectedComponents.run(spark, edges, Graph.CcRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // and the structure is genuinely non-trivial: many components
    assert(got.values.toSet.size > 10)
  }
}
