package graft.ppr

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.graph.Csr

/** K6/K7 — FORA: Forward Push + Random Walks (Wang et al., KDD'17; SURVEY
  * §2.8; reference `Fora_Whole_Graph.java:82-146`, `Fora_Topk.java:102-184`).
  *
  * Whole-graph: push with rmax(ε) = ε·√(δ/(3·m·ln(2/p_fail)))/(1-α), then
  * for every residual node v run ω_v = ⌈(1-α)·r_v/rsum·ω⌉ no-zero-hop
  * walks, crediting a_v·rsum/ω per walk to the destination
  * (`Fora_Whole_Graph.java:86-87,122-139`). The reference's measured-time
  * rmax-halving loop (`:93-103`, 400 ns/walk cost model) is replaced by the
  * closed-form rmax — deterministic on a cluster, same (ε,δ,p_fail)
  * guarantee (SURVEY §7.4.4).
  *
  * Top-k: round loop δ: 1/k → ÷4 → 1/n; per round continue the carried
  * push state at the round's rmax, run residual walks onto a COPY of the
  * push reserve, stop when the kth score ≥ (1+ε′)·δ
  * (`Fora_Topk.java:122-180`; ε′ = ε/2 at `:110`).
  *
  * Scale shape: the batch API fans sources out over tasks (one dense
  * kernel per source over the broadcast CSR) — walks for a source never
  * leave their task, so shuffle volume is O(nonzero scores), not O(walks).
  */
object Fora {

  final case class Conf(
      alpha: Double = 0.15,
      epsilon: Double = 0.5,
      pfail: Double = 0.0, // 0 → 1/n (Algo_Conf.java:45-53)
      delta: Double = 0.0, // 0 → 1/n
      seed: Long = 42L)

  /** Shared whole-graph push phase: closed-form rmax(ε) push plus the
    * (rsum, ω·rsum) walk-bookkeeping scalars. ONE body serves both the
    * production kernel ([[wholeGraphLocal]]) and the verification trace
    * ([[wholeGraphTrace]]) so a parameter-formula edit cannot silently
    * diverge the oracle replay from production.
    */
  private def wholeGraphPush(
      csr: Csr, srcDense: Int, conf: Conf): (ForwardPush.PushState, Double, Long) = {
    val n = csr.numNodes.toDouble
    val m = csr.numEdges.toDouble
    val alpha = conf.alpha
    val eps = conf.epsilon
    val pf = if (conf.pfail > 0) conf.pfail else 1.0 / n
    val dl = if (conf.delta > 0) conf.delta else 1.0 / n
    val rmax = eps * math.sqrt(dl / 3.0 / m / math.log(2.0 / pf)) / (1.0 - alpha)
    val omega = (eps + 2.0) * math.log(2.0 / pf) / eps / eps / dl
    val st = ForwardPush.runLocal(csr, srcDense, alpha, rmax)
    val rsumLocal = st.residue.sum * (1.0 - alpha) // Fora_Whole_Graph.java:101
    val numWalks = (omega * rsumLocal).toLong
    (st, rsumLocal, numWalks)
  }

  /** Shared whole-graph residual-walk loop. Per residual node v:
    * `onResidual(v, r)` (production's α-fold), then ω_v = ⌈r_c/rsum·ω⌉
    * seeded walks each reported via `onWalk(vDense, destDense, incr)` —
    * the RNG stream keys and walk order are THE definition both the
    * production reduce and the materialized trace replay.
    */
  private def wholeGraphWalks(
      csr: Csr,
      srcDense: Int,
      residue: Array[Double],
      rsumLocal: Double,
      numWalks: Long,
      conf: Conf,
      onResidual: (Int, Double) => Unit,
      onWalk: (Int, Int, Double) => Unit): Unit = {
    val alpha = conf.alpha
    val srcKey = Rng.mix(conf.seed ^ (srcDense * 0x9E3779B97F4A7C15L))
    var v = 0
    while (v < csr.numNodes) {
      val r = residue(v)
      if (r != 0.0) {
        onResidual(v, r)                      // Fora_Whole_Graph.java:122-127
        val rc = (1.0 - alpha) * r
        val omegaI = math.ceil(rc / rsumLocal * numWalks).toLong
        if (omegaI > 0) {
          val aI = rc / rsumLocal * numWalks / omegaI
          val incr = aI / numWalks * rsumLocal
          var j = 0L
          while (j < omegaI) {
            val rng = new Rng.SplitMix(Rng.streamSeed(srcKey, v, j))
            val dest = MonteCarlo.walkEndpoint(csr, v, alpha, rng, noZeroHop = true)
            onWalk(v, dest, incr)
            j += 1
          }
        }
      }
      v += 1
    }
  }

  /** Whole-graph FORA for one source (dense kernel). */
  def wholeGraphLocal(csr: Csr, srcDense: Int, conf: Conf): Array[Double] = {
    val (st, rsumLocal, numWalks) = wholeGraphPush(csr, srcDense, conf)
    val reserve = st.reserve.clone()
    if (numWalks <= 0L) return reserve
    wholeGraphWalks(csr, srcDense, st.residue, rsumLocal, numWalks, conf,
      onResidual = (v, r) => reserve(v) += conf.alpha * r,
      onWalk = (_, dest, incr) => reserve(dest) += incr)
    reserve
  }

  /** Walk recorder for [[topkRun]]'s trace mode: dense (start, endpoint)
    * pairs, reset at every round start so only the TERMINATING round's
    * walks survive for the oracle replay. The production path passes
    * `rec = null` — a hoisted null check per walk instead of the
    * per-walk `Function2` dispatch the r13 kernel dedup introduced,
    * which r17 measured as the syn_fora_topk −18 % dip (callbacks were
    * no-ops on the hot path but the megamorphic call cost ~25 % at the
    * walk-heavy ε = 0.1 grid point; 2,660 qpm with the check vs 2,000
    * with the lambdas, same seeds, same output).
    */
  private final class WalkRec {
    var walks: scala.collection.mutable.ArrayBuilder[(Int, Int)] =
      Array.newBuilder[(Int, Int)]
    def reset(): Unit = walks = Array.newBuilder[(Int, Int)]
  }

  /** Shared top-k δ-halving round loop — ONE body serves both the
    * production kernel ([[topkLocal]], `rec = null`) and the
    * verification trace ([[topkTrace]]), so rmax/ω formulas, RNG stream
    * keys and the round-advance decision cannot drift between them.
    * Returns the terminating round's (carried push state, walk count,
    * estimate vector).
    */
  private def topkRun(
      csr: Csr, srcDense: Int, k: Int, conf: Conf,
      rec: WalkRec): (ForwardPush.PushState, Long, Array[Double]) = {
    val n = csr.numNodes.toDouble
    val m = csr.numEdges.toDouble
    val alpha = conf.alpha
    val eps = conf.epsilon * 0.5 // Fora_Topk.java:110
    // pfail' = pfail/n²/ln(n/k) — natural log per Algo_Conf.java:76.
    // Intentional deviation: the reference divides node_amount/k in Java
    // INT arithmetic (ln(⌊n/k⌋)); we keep the real-valued ratio ln(n/k),
    // which is the quantity the FORA paper's union bound actually needs —
    // the truncation is an artifact, not a semantic.
    val pf0 = if (conf.pfail > 0) conf.pfail else 1.0 / n
    val pf = pf0 / n / n / math.log(n / k.toDouble)
    val minDelta = 1.0 / n
    var deltaLocal = 1.0 / k.toDouble

    if (csr.outDegree(srcDense) == 0) { // Fora_Topk.java:127-131
      val res = new Array[Double](csr.numNodes)
      res(srcDense) = 1.0
      return (ForwardPush.PushState(res, new Array[Double](csr.numNodes), 0.0),
        0L, res)
    }

    val srcKey = Rng.mix(conf.seed ^ (srcDense * 0xC2B2AE3D27D4EB4FL))
    var carried = {
      val init = new Array[Double](csr.numNodes)
      init(srcDense) = 1.0
      ForwardPush.PushState(new Array[Double](csr.numNodes), init, 1.0)
    }
    var round = 0
    var result: (ForwardPush.PushState, Long, Array[Double]) = null
    while (result == null) {
      if (rec != null) rec.reset()
      var rmax = eps * math.sqrt(deltaLocal / 3.0 / m / math.log(2.0 / pf))
      val omega = (eps + 2.0) * math.log(2.0 / pf) / eps / eps / deltaLocal
      rmax *= math.sqrt(m * rmax) * 3.0 // Fora_Topk.java:133

      carried = ForwardPush.runLocalFrom(csr, carried, srcDense, alpha, rmax)
      val rsumRw = carried.residue.sum * (1.0 - alpha)
      val numWalks = (omega * rsumRw).toLong

      val est = carried.reserve.clone()
      if (numWalks > 0) {
        var v = 0
        while (v < csr.numNodes) {
          val r = carried.residue(v)
          if (r != 0.0) {
            val omegaI = math.ceil(r * numWalks).toLong // Fora_Topk.java:158
            if (omegaI > 0) {
              val incr = r / omegaI
              var j = 0L
              while (j < omegaI) {
                val rng = new Rng.SplitMix(Rng.streamSeed(srcKey + round, v, j))
                val dest = MonteCarlo.walkEndpoint(csr, v, alpha, rng, noZeroHop = false)
                est(dest) += incr
                if (rec != null) rec.walks += ((v, dest))
                j += 1
              }
            }
          }
          v += 1
        }
      }

      val kth = kthLargest(est, k)
      if (kth >= (1.0 + eps) * deltaLocal || deltaLocal <= minDelta)
        result = (carried, numWalks, est)
      else
        deltaLocal = math.max(minDelta, deltaLocal / 4.0) // Fora_Topk.java:179
      round += 1
    }
    result
  }

  /** K7 — top-k FORA for one source; returns the full estimate vector of
    * the terminating round (caller applies tie-inclusive top-k).
    */
  def topkLocal(csr: Csr, srcDense: Int, k: Int, conf: Conf): Array[Double] =
    topkRun(csr, srcDense, k, conf, rec = null)._3

  /** kth largest value (0.0 when fewer than k nonzero entries) — the
    * `Algo_Util.kth_ppr` quickselect becomes a sort over the nonzero
    * support (reference `Algo_Util.java:32-79`).
    */
  def kthLargest(scores: Array[Double], k: Int): Double = {
    val nz = scores.filter(_ > 0.0)
    if (nz.length < k) 0.0
    else {
      java.util.Arrays.sort(nz)
      nz(nz.length - k)
    }
  }

  /** Verification-mode trace of one [[wholeGraphLocal]] run: the post-push
    * state, the walk-bookkeeping scalars, and every residual walk's
    * endpoint, as DATA — the `g_fora_ppr` driver row materializes these as
    * parquet so the DuckDB oracle can replay the entire deterministic
    * reduce (ω_v = ⌈r_c/rsum·ω⌉, a_v, per-walk credit, final scores) and
    * hash-match it; walk GENERATION stays seeded-kernel territory (SURVEY
    * §5.2). ForaSpec pins the trace's recomposed scores to
    * [[wholeGraphLocal]]'s. Dense ids are resolved to original ids here.
    */
  final case class WholeTrace(
      reserve: Array[Double],
      residue: Array[Double],
      rsum: Double,
      numWalks: Long,
      walks: Array[(Long, Long)]) // (walk start, endpoint) original ids

  def wholeGraphTrace(csr: Csr, srcDense: Int, conf: Conf): WholeTrace = {
    val (st, rsumLocal, numWalks) = wholeGraphPush(csr, srcDense, conf)
    val walks = Array.newBuilder[(Long, Long)]
    if (numWalks > 0L)
      wholeGraphWalks(csr, srcDense, st.residue, rsumLocal, numWalks, conf,
        onResidual = (_, _) => (),
        onWalk = (v, dest, _) =>
          walks += ((csr.originalOf(v), csr.originalOf(dest))))
    WholeTrace(st.reserve, st.residue, rsumLocal, numWalks, walks.result())
  }

  /** Verification-mode trace of [[topkLocal]]'s TERMINATING round: the
    * carried post-push state, the round's walk count, and every walk's
    * endpoint (original ids). The round-advance decision (kth score vs
    * (1+ε′)·δ) is made by the kernel exactly as in [[topkLocal]]; the
    * oracle replays only the terminating round's reduce and tie-inclusive
    * cut. ForaSpec pins the recomposed cut to [[topkLocal]]'s.
    */
  final case class TopkTrace(
      reserve: Array[Double],
      residue: Array[Double],
      numWalks: Long,
      walks: Array[(Long, Long)])

  def topkTrace(csr: Csr, srcDense: Int, k: Int, conf: Conf): TopkTrace = {
    val rec = new WalkRec
    val (carried, numWalks, _) = topkRun(csr, srcDense, k, conf, rec)
    TopkTrace(carried.reserve.clone(), carried.residue.clone(), numWalks,
      rec.walks.result().map { case (v, dest) =>
        (csr.originalOf(v), csr.originalOf(dest))
      })
  }

  /** Batched whole-graph FORA. Returns (src, node_id, score). */
  def batch(
      spark: SparkSession,
      csr: Csr,
      sources: Seq[Long],
      conf: Conf = Conf(),
      slices: Int = 0): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(csr)
    val nSlices = if (slices > 0) slices
      else math.min(math.max(1, sources.length), spark.sparkContext.defaultParallelism)
    spark.sparkContext.parallelize(sources, nSlices)
      .flatMap { s =>
        val g = bc.value
        val sd = g.denseOf(s)
        if (sd < 0) Iterator.empty
        else {
          val scores = wholeGraphLocal(g, sd, conf)
          scores.iterator.zipWithIndex.collect {
            case (p, v) if p != 0.0 => (s, g.originalOf(v), p)
          }
        }
      }
      .toDF("src", "node_id", "score")
  }

  /** Batched top-k FORA, tie-inclusive (T2). Returns (src, node_id, score). */
  def topkBatch(
      spark: SparkSession,
      csr: Csr,
      sources: Seq[Long],
      k: Int,
      conf: Conf = Conf(),
      slices: Int = 0): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(csr)
    val nSlices = if (slices > 0) slices
      else math.min(math.max(1, sources.length), spark.sparkContext.defaultParallelism)
    spark.sparkContext.parallelize(sources, nSlices)
      .flatMap { s =>
        val g = bc.value
        val sd = g.denseOf(s)
        if (sd < 0) Iterator.empty
        else {
          val scores = topkLocal(g, sd, k, conf)
          val kth = kthLargest(scores, k)
          scores.iterator.zipWithIndex.collect {
            case (p, v) if p > 0.0 && (kth == 0.0 || p >= kth) =>
              (s, g.originalOf(v), p)
          }
        }
      }
      .toDF("src", "node_id", "score")
  }
}
