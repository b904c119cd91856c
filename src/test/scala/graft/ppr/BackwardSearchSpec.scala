package graft.ppr

import graft.SparkSpec
import graft.graph.GraphOps
import org.apache.spark.sql.functions._

class BackwardSearchSpec extends SparkSpec {

  private def edgesDf = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
  }

  private val alpha = 0.15

  private def kernels(edges: org.apache.spark.sql.DataFrame) = {
    val csr = GraphOps.buildCsr(edges)
    val rcsr = GraphOps.buildCsr(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val fwdDeg = Array.tabulate(rcsr.numNodes) { v =>
      val d = csr.denseOf(rcsr.originalOf(v))
      if (d < 0) 0 else csr.outDegree(d)
    }
    (csr, rcsr, fwdDeg)
  }

  test("backward column approximates π(·, t) from power iteration") {
    val (csr, rcsr, fwdDeg) = kernels(edgesDf)
    val t = 3L
    val col_t = BackwardSearch.runLocal(rcsr, fwdDeg, rcsr.denseOf(t), alpha, 1e-9)
    // exact π(s, t) for every source s via power iteration (no dangling
    // nodes in this graph, so forward/backward agree exactly).
    for (s <- Seq(1L, 2L, 3L, 4L)) {
      val exact = PowerIteration.runLocal(csr, csr.denseOf(s), alpha, 500)
      val est = col_t(rcsr.denseOf(s))
      assert(math.abs(exact(csr.denseOf(t)) - est) < 1e-6,
        s"π($s,$t): exact=${exact(csr.denseOf(t))} est=$est")
    }
  }

  test("distributed run matches dense kernel at fixed supersteps") {
    val (csr, rcsr, fwdDeg) = kernels(edgesDf)
    val t = 1L
    val steps = 8
    val local = BackwardSearch.runLocal(rcsr, fwdDeg, rcsr.denseOf(t), alpha, 1e-4, steps)
    val dist = BackwardSearch.run(spark, edgesDf, t, alpha, 1e-4, steps)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (v <- 0 until rcsr.numNodes) {
      val id = rcsr.originalOf(v)
      assert(math.abs(local(v) - dist.getOrElse(id, 0.0)) < 1e-12)
    }
  }
}
