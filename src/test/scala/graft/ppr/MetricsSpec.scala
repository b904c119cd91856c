package graft.ppr

import graft.SparkSpec

class MetricsSpec extends SparkSpec {

  private def dfs = {
    val s = spark
    import s.implicits._
    // src 1: gnd ranks nodes 10,20,30 (scores .5,.3,.2); est swaps 20/30
    // and misses 30's score slightly.
    val gnd = Seq((1L, 10L, 0.5), (1L, 20L, 0.3), (1L, 30L, 0.2))
      .toDF("src", "node_id", "score")
    val est = Seq((1L, 10L, 0.5), (1L, 30L, 0.31), (1L, 20L, 0.19))
      .toDF("src", "node_id", "score")
    (gnd, est)
  }

  test("maxAbsErr over gnd support with missing = 0") {
    val (gnd, est) = dfs
    val err = Metrics.maxAbsErr(gnd, est).collect().head.getDouble(1)
    assert(math.abs(err - 0.11) < 1e-12) // |0.3-0.19|=0.11 dominates |0.2-0.31|
  }

  test("precision@2 tie-inclusive") {
    val (gnd, est) = dfs
    // gnd top2 = {10,20}; est top2 = {10,30} → 1/2.
    val p = Metrics.precisionAtK(gnd, est, 2).collect().head.getDouble(1)
    assert(p == 0.5)
  }

  test("ndcg@2 uses gnd gains in est order") {
    val (gnd, est) = dfs
    val got = Metrics.ndcgAtK(gnd, est, 2).collect().head.getDouble(1)
    def gain(p: Double) = math.pow(2.0, p) - 1.0
    val dcgEst = gain(0.5) / (math.log(2) / math.log(2)) +
      gain(0.2) / (math.log(3) / math.log(2))
    val dcgIdeal = gain(0.5) + gain(0.3) / (math.log(3) / math.log(2))
    assert(math.abs(got - dcgEst / dcgIdeal) < 1e-12)
  }

  test("summary averages across sources") {
    val (gnd, est) = dfs
    val row = Metrics.summary(gnd, est, 2).collect().head
    assert(row.getDouble(0) == 0.5) // one source → avg = its precision
  }
}
