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
