package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  private def edgesDf = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
  }

  test("outDegrees / inDegrees") {
    val out = GraphOps.outDegrees(edgesDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    val in = GraphOps.inDegrees(edgesDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(in == Map(2L -> 1L, 3L -> 2L, 1L -> 1L))
  }

  test("symmetrize doubles directed edges and dedups") {
    val sym = GraphOps.symmetrize(edgesDf)
    // pairs {1,2},{1,3},{2,3} in both directions; (1,3)/(3,1) dedup.
    assert(sym.count() == 6)
    val pairs = sym.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 1L)) && pairs.contains((1L, 2L)))
  }

  test("CSR round-trips ids, degrees, sorted neighbors") {
    val csr = GraphOps.buildCsr(edgesDf)
    assert(csr.numNodes == 3 && csr.numEdges == 4)
    val d1 = csr.denseOf(1L)
    assert(csr.outDegree(d1) == 2)
    val nbrs = (0 until csr.outDegree(d1)).map(k => csr.originalOf(csr.neighbor(d1, k)))
    assert(nbrs == Seq(2L, 3L))
    assert(csr.denseOf(99L) == -1)
  }

  test("lineitemGraph has no self loops and is distinct") {
    val g = GraphOps.lineitemGraph(spark, sfDir, 97)
    assert(g.where(col("src") === col("dst")).count() == 0)
    assert(g.count() == g.distinct().count())
  }
}
