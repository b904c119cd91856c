package graft.queries

import graft.SparkSpec
import graft.graph.GraphOps

class KcoreSpec extends SparkSpec {

  private def peel(und0: Set[(Long, Long)], k: Int, rounds: Int)
      : Set[(Long, Long)] = {
    var edges = und0
    for (_ <- 1 to rounds) {
      val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size).toMap
      edges = edges.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
    }
    edges
  }

  test("g_kcore matches brute-force peeling, is a strict nontrivial " +
      "subset, and the horizon reaches the fixpoint") {
    val got = Graph.queries("g_kcore")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val und = GraphOps.lineitemGraph(spark, sfDir, Graph.TriMod).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val core = peel(und, Graph.KcoreK, Graph.KcoreRounds)
    val want = core.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)

    // nontrivial: the peel removed something and left something.
    val allNodes = und.flatMap { case (a, b) => Seq(a, b) }
    assert(got.nonEmpty && got.size < allNodes.size,
      s"core ${got.size} of ${allNodes.size} nodes is vacuous")
    // fixed horizon reached the fixpoint: one more peel is a no-op,
    // hence every surviving node's in-core degree is ≥ K.
    assert(peel(core, Graph.KcoreK, 1) == core, "horizon missed fixpoint")
    got.values.foreach(d => assert(d >= Graph.KcoreK))
  }
}
