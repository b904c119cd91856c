package graft.queries

import graft.SparkSpec
import graft.graph.GraphOps

class GraphProfileSpec extends SparkSpec {

  private def edges: Array[(Long, Long)] =
    GraphOps.lineitemGraph(spark, sfDir, Graph.Mod).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("g_reciprocity matches brute force and is a strict fraction") {
    val r = Graph.queries("g_reciprocity")(spark, sfDir).collect()(0)
    val es = edges
    val set = es.toSet
    val mutual = es.count { case (a, b) => set.contains((b, a)) }.toLong
    assert((r.getLong(0), r.getLong(1)) == ((es.length.toLong, mutual)))
    assert(r.getDouble(2) == mutual.toDouble / es.length.toDouble)
    // the directed derivation must be neither symmetric nor reverse-free
    // for the metric to be non-vacuous
    assert(mutual > 0L && mutual < es.length.toLong)
  }

  test("g_richclub matches a brute-force ladder replay, with the " +
      "empty-club zero branch real at the top rungs") {
    val got = Graph.queries("g_richclub")(spark, sfDir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Graph.RichClubKs.toSet)
    val und = GraphOps.lineitemGraph(spark, sfDir, Graph.TriMod).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).distinct
    val deg = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    Graph.RichClubKs.foreach { k =>
      val club = deg.filter(_._2 > k).keySet
      val nK = club.size.toLong
      val eK = und.count { case (a, b) => club(a) && club(b) }.toLong
      val phi = if (nK >= 2) 2.0 * eK / (nK * (nK - 1)).toDouble else 0.0
      assert(got(k) == ((nK, eK, phi)), s"rung k=$k")
    }
    // the profile is non-vacuous: some rung has a nonzero club and some
    // rung is empty (the zero branch is exercised, not dead code)
    assert(got.values.exists(_._3 > 0.0))
    assert(got.values.exists(t => t._1 < 2))
  }

  test("g_degree_hist matches brute-force bit-length buckets and " +
      "covers every source node") {
    val got = Graph.queries("g_degree_hist")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = edges.groupBy(_._1).values
      .map(_.size).groupBy(d => java.lang.Long.toBinaryString(d.toLong)
        .length.toLong)
      .view.mapValues(_.size.toLong).toMap
    assert(got == want)
    assert(got.values.sum == edges.map(_._1).distinct.length.toLong)
    assert(got.size > 1, "degree profile collapsed to one bucket")
  }
}
