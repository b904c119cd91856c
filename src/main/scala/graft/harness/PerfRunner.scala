package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.Csr
import graft.ppr._

/** H4 — the per-grid-point performance test (reference `algo_perf_test`,
  * `Gen_Util.java:109-257`): run the algorithm under test over the sampled
  * query sources, run the Power-Method oracle, and reduce to the averaged
  * duration/precision/NDCG/max-err the log row records.
  *
  * Spark-first deltas from the reference loop, both deliberate:
  *   - the reference runs algo + PM once PER QUERY in a driver loop; here
  *     each grid point is ONE batched job over all sources (the kernels'
  *     `batch` path over the broadcast CSR), and metrics are single
  *     DataFrame passes over `(src, node_id, score)` tables;
  *   - the PM ground truth is computed ONCE per suite and reused across
  *     every grid point (the reference recomputes it per query per point —
  *     `Gen_Util.java:153-154,222-223` — which at 50 queries × 25 points
  *     is 1250 identical full PPR runs).
  */
final class PerfRunner(
    val spark: SparkSession,
    edges: DataFrame,
    val csr: Csr,
    alpha: Double,
    pmIterations: Int = 100,
    seed: Long = 42L) {

  /** Estimates are materialized via a [[graft.operators.CkptChain]]: each
    * [[timed]]/[[prepAndRead]] call releases the PREVIOUS call's pinned
    * snapshot (grid rows are consumed sequentially — metrics for a row
    * complete before the next row runs), so a full parameter grid pins one
    * estimate at a time instead of one per row. Call [[releaseEstimates]]
    * when the suite is done.
    */
  private val estChain = new graft.operators.CkptChain(spark.sparkContext)

  /** Release the last estimate snapshot ([[GridDriver]] calls this in its
    * `finally` alongside the ground-truth unpersist).
    */
  def releaseEstimates(): Unit = estChain.releaseAll()

  /** Ground truth `(src, node_id, score)` for a source sample — cache it
    * for the suite (call `unpersist()` on the result when done).
    */
  def groundTruth(sources: Seq[Long]): DataFrame = {
    val g = PowerIteration
      .batch(spark, csr, sources, alpha, pmIterations)
      .persist()
    g.count()
    g
  }

  /** One algorithm run over the source batch → `(src, node_id, score)`.
    * `param` is the family's accuracy knob: ε (FORA/MC), rmax (FWDPUSH),
    * iterations (LIBRARY). BASE is store-mediated — see [[prepAndRead]].
    */
  def runBatch(algo: String, sources: Seq[Long], param: Double,
      k: Int = -1): DataFrame = algo match {
    case "MC" =>
      MonteCarlo.sspprBatch(spark, csr, sources, alpha, epsilon = param,
        seed = seed)
    case "FWDPUSH" =>
      ForwardPush.batch(spark, csr, sources, alpha, rmax = param)
    case "FORA_WHOLE_GRAPH" =>
      Fora.batch(spark, csr, sources,
        Fora.Conf(alpha = alpha, epsilon = param, seed = seed))
    case "FORA_TOPK" =>
      Fora.topkBatch(spark, csr, sources, k,
        Fora.Conf(alpha = alpha, epsilon = param, seed = seed))
    case "LIBRARY" =>
      // one GraphX traversal for the whole batch with exact per-source
      // static semantics (runBatch refuses partial parallel batches —
      // Spark's runParallelPersonalizedPageRank drops reachable mass on
      // them; see GraphXPpr.runBatch) — a per-source driver loop here
      // costs |sources| full runs per grid point (fatal for the
      // 107-source preprocessing suite).
      GraphXPpr.runBatch(spark, edges, sources, alpha, param.toInt)
    case other =>
      throw new IllegalArgumentException(s"no batch runner for '$other'")
  }

  /** BASE / preprocessing path: build the store (timed), then answer the
    * whole source batch with ONE partition-pruned scan (timed) — the Spark
    * shape of "query = read one file per source".
    * Returns (scores, prepMs, prepBytes, queryMs).
    */
  def prepAndRead(algo: String, sources: Seq[Long], param: Double,
      threshold: Double, k: Int = -1): (DataFrame, Long, Long, Long) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_harness_prep").toString + "/store"
    val t0 = System.nanoTime()
    algo match {
      case "BASE_WHOLE_GRAPH" =>
        val ap = Base.allPairs(spark, edges, alpha, rmax = 1e-4,
          scoreThreshold = threshold)
        if (k > 0) Base.writeTopkStore(ap, dir, k) else Base.writeStore(ap, dir)
      case _ =>
        val scores = runBatch(algo, csr.ids.toSeq, param, k)
        PprStore.write(
          if (threshold > 0) scores.where(col("score") >= threshold)
          else scores,
          dir)
    }
    val prepMs = (System.nanoTime() - t0) / 1000000L
    val prepBytes = PprStore.size(spark, dir)
    val t1 = System.nanoTime()
    val scores = estChain(spark.read.parquet(dir)
      .where(col("src").isin(sources.distinct: _*))
      .select(col("src"), col("node_id"), col("score")))
    val queryMs = (System.nanoTime() - t1) / 1000000L
    PprStore.delete(spark, dir)
    (scores, prepMs, prepBytes, queryMs)
  }

  /** Materialize an estimate and wall-time it (the reference times
    * `computeWholeGraphPPR`/`computeTopKPPR` per query; one batched job is
    * the equivalent unit here).
    */
  def timed(df: => DataFrame): (DataFrame, Long) = {
    val t0 = System.nanoTime()
    val mat = estChain(df)
    (mat, (System.nanoTime() - t0) / 1000000L)
  }

  /** Averaged whole-graph error: mean over sources of max|est − gnd| over
    * the ground-truth support (`Gen_Util.java:306-321,235-247`).
    */
  def avgMaxErr(gnd: DataFrame, est: DataFrame): Double =
    Metrics.maxAbsErr(gnd, est)
      .agg(avg("max_err")).head.getDouble(0)

  /** Averaged top-k quality: (precision@k, NDCG@k) means over sources
    * (`Gen_Util.java:168-179`). Inputs are full (or pre-truncated) score
    * tables; tie-inclusive top-k sets are derived inside the metrics.
    */
  def avgTopkQuality(gnd: DataFrame, est: DataFrame, k: Int): (Double, Double) = {
    val p = Metrics.precisionAtK(gnd, est, k).agg(avg("precision")).head.getDouble(0)
    val n = Metrics.ndcgAtK(gnd, est, k).agg(avg("ndcg")).head.getDouble(0)
    (p, n)
  }
}
