package graft.ppr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{Csr, GraphOps}

/** K2/K3 — Forward Push (local push), SURVEY §2.8; reference
  * `Forward_Push.java:63-142`.
  *
  * Semantics per superstep for every node v with residue r(v):
  *   - eligible iff r(v)/outdeg(v) ≥ rmax; a dangling node (outdeg 0) is
  *     always eligible when r(v) > 0 (reference: r/0 = ∞ ≥ rmax,
  *     `Forward_Push.java:132` — then the sink branch `:101-115` returns
  *     the mass to the SOURCE);
  *   - eligible v: reserve(v) += α·r(v), each out-neighbor u receives
  *     (1-α)·r(v)/outdeg(v); dangling v sends (1-α)·r(v) to the source;
  *   - ineligible v keeps r(v).
  *
  * The reference processes nodes one-at-a-time from a queue (asynchronous);
  * we push the WHOLE frontier each superstep (bulk-synchronous). Push is a
  * linear operator, so the fixpoint and the maxErr ≤ rmax·m bound are
  * identical; only intermediate states differ (SURVEY §7.4.3). With a FIXED
  * superstep count the BSP schedule is fully deterministic, which is what
  * makes the unrolled-SQL DuckDB oracle possible.
  *
  * Scale: [[run]] shuffles once per superstep (join + groupBy) and holds
  * only (id, r) state — at 100 TB the state stays partitioned by id and
  * never visits the driver. [[runLocal]] is the per-task dense kernel used
  * by the batched multi-source path ([[batch]]) when the graph CSR is
  * broadcastable.
  */
object ForwardPush {

  /** Distributed BSP forward push. If `maxSupersteps` > 0, runs exactly that
    * many supersteps (deterministic, oracle-checkable); otherwise runs until
    * the frontier is empty (fixpoint: no node eligible).
    * Returns (node_id LONG, score DOUBLE) — the reserve; zero rows omitted.
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      source: Long,
      alpha: Double = 0.15,
      rmax: Double = 1e-4,
      maxSupersteps: Int = 0,
      checkpointEvery: Int = 1): DataFrame = {
    // checkpointEvery=1: the per-superstep state feeds THREE branches
    // (eligible/retained/dangling), so an unbroken lineage grows ~3^steps
    // subplans — eager localCheckpoint each superstep keeps the plan flat.
    // Chained checkpoints release the previous generation as the next one
    // materializes; only the final state stays pinned (it backs the
    // returned DataFrame).
    import spark.implicits._
    val ckpt = new graft.operators.CkptChain(spark.sparkContext)

    val deg = GraphOps.outDegrees(edges).persist()
    val e = edges.persist()

    // degenerate source short-circuit (fixpoint mode only; see runLocal).
    if (maxSupersteps <= 0 &&
        deg.where(col("id") === source).isEmpty) {
      deg.unpersist(); e.unpersist()
      return Seq((source, 1.0)).toDF("node_id", "score")
    }

    var residue = Seq((source, 1.0)).toDF("id", "r")
    // reserveParts accumulates α·r over eligible rows per superstep.
    var reserve = spark.emptyDataset[(Long, Double)].toDF("id", "p")

    var it = 0
    var frontierNonEmpty = true
    while (frontierNonEmpty && (maxSupersteps <= 0 || it < maxSupersteps)) {
      // left join degrees: null deg = dangling = always eligible.
      val state = residue.join(deg, Seq("id"), "left_outer")
      val eligible = state.where(col("deg").isNull ||
        col("r") / col("deg") >= rmax)
      val retained = state.where(col("deg").isNotNull &&
        col("r") / col("deg") < rmax)
        .select(col("id"), col("r"))

      if (maxSupersteps <= 0 && eligible.isEmpty) {
        frontierNonEmpty = false
      } else {
        reserve = reserve
          .union(eligible.select(col("id"), (lit(alpha) * col("r")).as("p")))
          .groupBy("id").agg(sum("p").as("p"))
        val pushed = eligible.where(col("deg").isNotNull)
          .join(e, eligible("id") === e("src"))
          .select(col("dst").as("id"),
            (lit(1.0 - alpha) * col("r") / col("deg")).as("r"))
        val dangling = eligible.where(col("deg").isNull)
          .select(lit(source).as("id"), (lit(1.0 - alpha) * col("r")).as("r"))
        residue = pushed.union(retained).union(dangling)
          .groupBy("id").agg(sum("r").as("r"))
        it += 1
        if (it % checkpointEvery == 0) {
          // joint generation: residue and reserve both derive from the
          // previous residue, so neither may be released until both new
          // snapshots are materialized.
          val Seq(r2, p2) = ckpt(Seq(residue, reserve))
          residue = r2; reserve = p2
        }
      }
    }
    val out = reserve.select(col("id").as("node_id"), col("p").as("score"))
      .where(col("score") =!= 0.0)
    deg.unpersist(); e.unpersist()
    out
  }

  /** Residue vector after the same BSP schedule — for FORA's walk phase. */
  final case class PushState(reserve: Array[Double], residue: Array[Double], rsum: Double)

  /** Dense per-task kernel, identical BSP schedule to [[run]].
    * `maxSupersteps <= 0` means run to fixpoint (frontier empty).
    *
    * Degenerate source (out-degree 0) short-circuits to π(s,s)=1 in
    * fixpoint mode (reference `Forward_Push.java:72-76`) — otherwise the
    * source would push to itself forever.
    */
  def runLocal(
      csr: Csr,
      sourceDense: Int,
      alpha: Double,
      rmax: Double,
      maxSupersteps: Int = 0): PushState = {
    val n = csr.numNodes
    if (maxSupersteps <= 0 && csr.outDegree(sourceDense) == 0) {
      val reserve = new Array[Double](n)
      reserve(sourceDense) = 1.0
      return PushState(reserve, new Array[Double](n), 0.0)
    }
    val init = new Array[Double](n)
    init(sourceDense) = 1.0
    runLocalFrom(csr, PushState(new Array[Double](n), init, 1.0),
      sourceDense, alpha, rmax, maxSupersteps)
  }

  /** Same BSP schedule continuing from a carried state — the "Q_next"
    * carry-over of the FORA top-k rounds (reference
    * `Forward_Push.java:144-250`: parked nodes re-checked at poll time; in
    * BSP the carried residue array IS the parked frontier, re-screened
    * against the new rmax each superstep).
    */
  def runLocalFrom(
      csr: Csr,
      init: PushState,
      sourceDense: Int,
      alpha: Double,
      rmax: Double,
      maxSupersteps: Int = 0): PushState = {
    val n = csr.numNodes
    var residue = init.residue.clone()
    val reserve = init.reserve.clone()
    var rsum = init.rsum
    var it = 0
    var active = true
    while (active && (maxSupersteps <= 0 || it < maxSupersteps)) {
      active = false
      val next = new Array[Double](n)
      var v = 0
      while (v < n) {
        val r = residue(v)
        if (r != 0.0) {
          val d = csr.outDegree(v)
          val eligible = d == 0 || r / d >= rmax
          if (eligible) {
            active = true
            reserve(v) += alpha * r
            rsum -= alpha * r
            if (d > 0) {
              val share = (1.0 - alpha) * r / d
              csr.foreachNeighbor(v)(u => next(u) += share)
            } else {
              next(sourceDense) += (1.0 - alpha) * r
            }
          } else {
            next(v) += r
          }
        }
        v += 1
      }
      residue = next
      it += 1
    }
    PushState(reserve, residue, rsum)
  }

  /** Batched multi-source forward push over a broadcast CSR: one task per
    * slice of sources, zero per-superstep shuffle.
    * Returns (src LONG, node_id LONG, score DOUBLE).
    */
  def batch(
      spark: SparkSession,
      csr: Csr,
      sources: Seq[Long],
      alpha: Double = 0.15,
      rmax: Double = 1e-4,
      maxSupersteps: Int = 0,
      slices: Int = 0): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(csr)
    val nSlices = if (slices > 0) slices
      else math.min(math.max(1, sources.length), spark.sparkContext.defaultParallelism)
    spark.sparkContext
      .parallelize(sources, nSlices)
      .flatMap { s =>
        val g = bc.value
        val sd = g.denseOf(s)
        if (sd < 0) Iterator.empty
        else {
          val st = runLocal(g, sd, alpha, rmax, maxSupersteps)
          st.reserve.iterator.zipWithIndex.collect {
            case (p, v) if p != 0.0 => (s, g.originalOf(v), p)
          }
        }
      }
      .toDF("src", "node_id", "score")
  }

  /** DuckDB oracle for the FIXED-superstep BSP schedule, multi-source.
    * `graphSql` must yield (src, dst). Output: (src, node_id, score),
    * score rounded to `roundTo`.
    *
    * State recurrence (matching [[run]]/[[runLocal]] exactly):
    *   eligible(v)  = deg IS NULL OR r/deg >= rmax
    *   reserve     += α·r over eligible rows (accumulated, rounded at end)
    *   r'           = Σ pushes + retained ineligible r + dangling→source
    */
  def oracleSqlMulti(
      graphSql: String,
      sources: Seq[Long],
      alpha: Double,
      rmax: Double,
      supersteps: Int,
      roundTo: Int = 9): String = {
    val push = 1.0 - alpha
    val values = sources.map(s => s"($s)").mkString(", ")
    val sb = new StringBuilder
    sb ++= s"WITH edges AS MATERIALIZED ($graphSql),\n"
    sb ++= "deg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),\n"
    sb ++= s"srcs(s) AS (VALUES $values),\n"
    sb ++= "r0 AS (SELECT CAST(s AS BIGINT) AS s, CAST(s AS BIGINT) AS id, " +
      "CAST(1.0 AS DOUBLE) AS r FROM srcs),\n"
    for (i <- 0 until supersteps) {
      val prev = s"r$i"
      // j{i}: previous state with degree and eligibility flag.
      sb ++= s"j$i AS MATERIALIZED (SELECT t.s, t.id, t.r, d.deg, " +
        s"(d.deg IS NULL OR t.r / d.deg >= $rmax) AS elig " +
        s"FROM $prev t LEFT JOIN deg d ON d.id = t.id),\n"
      // p{i}: α·r reserved this superstep by eligible nodes.
      sb ++= s"p$i AS (SELECT s, id, $alpha * r AS p FROM j$i WHERE elig),\n"
      // next residue: pushes along edges + retained + dangling-to-source.
      sb ++= s"r${i + 1} AS MATERIALIZED (SELECT s, id, sum(r) AS r FROM (" +
        s"SELECT t.s, e.dst AS id, $push * t.r / t.deg AS r FROM j$i t " +
        s"JOIN edges e ON e.src = t.id WHERE t.elig AND t.deg IS NOT NULL " +
        s"UNION ALL " +
        s"SELECT s, id, r FROM j$i WHERE NOT elig " +
        s"UNION ALL " +
        s"SELECT s, s AS id, $push * r AS r FROM j$i WHERE elig AND deg IS NULL" +
        s") GROUP BY s, id),\n"
    }
    val unions = (0 until supersteps).map(i => s"SELECT * FROM p$i").mkString(" UNION ALL ")
    sb ++= s"acc AS ($unions)\n"
    sb ++= s"SELECT s AS src, id AS node_id, round(sum(p), $roundTo) AS score " +
      s"FROM acc GROUP BY s, id HAVING round(sum(p), $roundTo) <> 0.0"
    sb.toString
  }
}
