package graft.ppr

import graft.SparkSpec
import graft.graph.{Csr, GraphOps}
import org.apache.spark.sql.functions._

class PowerIterationSpec extends SparkSpec {

  // 5-node graph: 1→2, 1→3, 2→3, 3→1, 4 dangling (edge 2→4).
  private def edgesDf = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 1L)).toDF("src", "dst")
  }

  private val alpha = 0.15
  private val iters = 50

  test("distributed run matches dense local kernel") {
    val csr = GraphOps.buildCsr(edgesDf)
    val local = PowerIteration.runLocal(csr, csr.denseOf(1L), alpha, iters)
    val dist = PowerIteration.run(spark, edgesDf, 1L, alpha, iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (v <- 0 until csr.numNodes) {
      val id = csr.originalOf(v)
      assert(math.abs(local(v) - dist.getOrElse(id, 0.0)) < 1e-12,
        s"node $id: local=${local(v)} dist=${dist.getOrElse(id, 0.0)}")
    }
  }

  test("shuffle-join path (broadcast guard off) matches the broadcast path") {
    // broadcastNodeLimit=0 forces the at-scale plan: frontier shuffle-joins
    // the pre-partitioned edge/degree sides instead of broadcasting.
    val shuffled = PowerIteration
      .run(spark, edgesDf, 1L, alpha, iters, broadcastNodeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bcast = PowerIteration.run(spark, edgesDf, 1L, alpha, iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(shuffled.keySet == bcast.keySet)
    shuffled.foreach { case (id, p) =>
      assert(math.abs(p - bcast(id)) < 1e-12, s"node $id")
    }
  }

  test("batch over CSR matches single-source run for each source") {
    val csr = GraphOps.buildCsr(edgesDf)
    val batch = PowerIteration.batch(spark, csr, Seq(1L, 2L, 3L), alpha, iters)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (s <- Seq(1L, 2L, 3L)) {
      val single = PowerIteration.run(spark, edgesDf, s, alpha, iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      single.foreach { case (id, p) =>
        assert(math.abs(p - batch.getOrElse((s, id), 0.0)) < 1e-12)
      }
    }
  }

  test("mass conservation: sum(score) = 1 - (1-alpha)^iters") {
    val csr = GraphOps.buildCsr(edgesDf)
    val scores = PowerIteration.runLocal(csr, csr.denseOf(1L), alpha, iters)
    val expected = 1.0 - math.pow(1.0 - alpha, iters)
    assert(math.abs(scores.sum - expected) < 1e-12)
  }

  test("dangling node returns mass to source, not uniform") {
    // node 4 has no out-edges; its residue must flow back to source 1.
    val csr = GraphOps.buildCsr(edgesDf)
    val scores = PowerIteration.runLocal(csr, csr.denseOf(1L), alpha, iters)
    // source keeps the largest score in this graph because all cycles and
    // the dangling restart return to it.
    assert(scores(csr.denseOf(1L)) == scores.max)
  }

  test("isolated source (outdeg 0) accumulates all mass at itself") {
    val s = spark
    import s.implicits._
    val e = Seq((2L, 3L), (9L, 2L)).toDF("src", "dst") // 5 not present as src
    val res = PowerIteration.run(spark, e, 5L, alpha, 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(res.keySet == Set(5L))
    assert(math.abs(res(5L) - (1.0 - math.pow(1 - alpha, 30))) < 1e-12)
  }
}
