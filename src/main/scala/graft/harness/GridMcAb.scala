package graft.harness

import org.apache.spark.sql.functions._

import graft.graph.Got
import graft.ppr.{MonteCarlo, PowerIteration}
import graft.queries.GotQueries

/** A/B micro-harness for the MC grid rows' cost structure (round-9 judge
  * item): per grid ε it times, separately,
  *   (a) seeded walk-endpoint GENERATION (the kernel, no sink),
  *   (b) generation + the parquet artifact WRITE (the rows' actual path),
  *   (c) the downstream read + stops/ω aggregate + 3-metric summary,
  * plus the PM ground truth cold vs memoized. The decision whether to
  * memoize the seeded endpoint tables across `got_grid_mc` /
  * `got_grid_mc_topk` (they regenerate bit-identically) hangs on (a)
  * being the dominant share of (b) — if the write floor dominates,
  * sharing buys nothing because each row must still write its OWN
  * artifacts for its oracle. Run: `runMain graft.harness.GridMcAb`;
  * numbers recorded in SURVEY §6.
  */
object GridMcAb {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val csr = Got.cachedCsr(spark)
    val n = csr.numNodes.toDouble

    // PM ground truth: cold kernel vs the 535-row driver memo
    def pmRows = PowerIteration.batch(spark, csr, GotQueries.GridSources,
        Got.Alpha, GotQueries.GridPmIters)
      .select(col("src"), col("node_id"), round(col("score"), 9).as("score"))
      .as[(Long, Long, Double)].collect()
    val (gndRows, tPmCold) = timed(pmRows)
    val (_, tPmWarm) = timed(pmRows)
    println(f"pm_gnd cold=$tPmCold%.2fs rerun=$tPmWarm%.2fs " +
      "(the memo saves ~one cold run per extra consumer row)")

    var totGen = 0.0
    var totWrite = 0.0
    var totDown = 0.0
    GotQueries.GridMcEpsilons.zipWithIndex.foreach { case (eps, i) =>
      val omega = MonteCarlo.omegaFor(eps, 1.0 / n, 1.0 / n)
      def endpoints = MonteCarlo.sspprEndpoints(spark, csr,
        GotQueries.GridSources, Got.Alpha, epsilon = eps)
      val (_, tGen) = timed(endpoints.count())
      val dir = graft.Scratch.dir(spark, s"mc_ab_e$i")
      val (_, tWrite) = timed(
        endpoints.write.mode("overwrite").parquet(dir))
      val (_, tDown) = timed {
        val gnd = gndRows.toSeq.toDF("src", "node_id", "score")
        val est = spark.read.parquet(dir)
          .groupBy("src", "node_id")
          .agg((count(lit(1)) / lit(omega.toDouble)).as("score"))
          .localCheckpoint(true)
        graft.ppr.Metrics.summary(gnd, est, GotQueries.GridK).collect()
      }
      totGen += tGen; totWrite += tWrite; totDown += tDown
      println(f"eps=$eps%.2f omega=$omega gen=$tGen%.2fs " +
        f"gen+write=$tWrite%.2fs downstream=$tDown%.2fs")
    }
    println(f"totals gen=$totGen%.2fs gen+write=$totWrite%.2fs " +
      f"downstream=$totDown%.2fs")
    spark.stop()
  }
}
