package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ppr.PowerIteration

/** Katz centrality — the attenuated-path-count member of the centrality
  * family (PageRank / HITS / closeness / harmonic live alongside it in
  * the query surface): x(v) counts walks ENDING at v, each length-j walk
  * attenuated by α^j. Computed as the classic truncated fixpoint
  *
  *   x⁰(v) = β;   x^{t+1}(v) = β + α · Σ_{u→v} x^t(u)
  *
  * with β = 1, a FIXED iteration horizon (the deterministic schedule the
  * DuckDB oracle replays as unrolled CTEs — [[oracleSql]]), and α chosen
  * below 1/λ_max so the truncation is a convergent prefix sum. The
  * per-superstep physical shape is [[graft.ppr.PageRank.run]]'s
  * union-carrier: contributions shuffle ONCE on dst, the node carrier
  * rides the same groupBy (c = 0 addends keep group sums bit-identical
  * to contribution-only sums), state localCheckpoints per superstep
  * through CkptChain, and there is no dangling/base term at all — Katz's
  * recurrence is the simplest of the family. Expression shapes and
  * evaluation order mirror the oracle exactly: per-edge `x * α`,
  * per-node `1.0 + coalesce(p, 0.0)`, end-state rounded by the caller.
  */
object Katz {

  /** Truncated Katz over an `(src, dst)` edge list. Returns
    * `(node_id LONG, katz DOUBLE)` for every node (β reaches all).
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      alpha: Double,
      iterations: Int): DataFrame = {
    val sc = spark.sparkContext
    def trackedCkpt(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def release(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))

    val e = edges.persist()
    val m = e.count()
    val p = math.min(sc.defaultParallelism.toLong, m / 1000000L + 1L).toInt
    val (nodes, nodesIds) = trackedCkpt(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    val (ew, ewIds) = trackedCkpt(
      e.select(col("src"), col("dst")).repartition(p, col("src")))
    e.unpersist()
    val n = nodes.count()

    val checkpoint = new graft.operators.CkptChain(sc)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevCodegen = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      if (p == 1) spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val small = n <= PowerIteration.BroadcastNodeLimit
      def sided(df: DataFrame): DataFrame = if (small) broadcast(df) else df
      var state = checkpoint(nodes.select(col("id"), lit(1.0).as("x")))
      val carrier = nodes.select(col("id"), lit(0.0).as("c"))
      var it = 0
      while (it < iterations) {
        val contrib = ew.join(sided(state), ew("src") === state("id"))
          .select(ew("dst").as("id"), (col("x") * lit(alpha)).as("c"))
        state = checkpoint(
          contrib.union(carrier)
            .groupBy("id").agg(sum(col("c")).as("p"))
            .select(col("id"), (lit(1.0) + col("p")).as("x")))
        it += 1
      }
      state.select(col("id").as("node_id"), col("x").as("katz"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.codegen.wholeStage", prevCodegen)
      release(nodesIds)
      release(ewIds)
    }
  }

  /** Dense in-task Katz for grid sweeps — one task per α over the
    * broadcast CSR (the `PowerIteration.batchSeedSets` grid economics:
    * zero per-iteration shuffles, the whole sweep is ONE job; the
    * distributed [[run]] costs ~`iterations` job floors per α, which at
    * GOT scale was the entire cost of `got_grid_katz`). The recurrence
    * is the same truncated fixpoint: per round acc[v] = Σ_{u→v} x[u]·α
    * (per-edge multiply-then-add, folded in CSR adjacency order), then
    * x'[v] = 1.0 + acc[v]. Addend ORDER differs from the distributed
    * groupBy fold — the same ≤ few-ulp noise the callers' round(…, 9)
    * already absorbs across engines; KatzSpec pins batch ≡ [[run]] at
    * 9 dp on the GOT fixture for every grid α. Returns
    * `(alpha DOUBLE, node_id LONG, katz DOUBLE)`.
    */
  def batchAlphasLocal(spark: SparkSession, csr: graft.graph.Csr,
      alphas: Seq[Double], iterations: Int): DataFrame = {
    import spark.implicits._
    // grid-sweep regime: the result (|alphas|·n rows) collects to a
    // LocalRelation — free to re-evaluate under the harnesses' per-row
    // unpersist sweep (the gridGroundTruth memo rationale) and it lets
    // the CSR broadcast be released HERE instead of leaking one copy
    // per invocation (r18 review finding). Loud failure past the
    // driver-sized bound; bigger graphs belong on [[run]].
    require(csr.numNodes.toLong * math.max(1, alphas.length) <= 10000000L,
      s"batchAlphasLocal is the grid-sweep regime (collects " +
        s"${csr.numNodes} nodes x ${alphas.length} alphas to the " +
        "driver) - use Katz.run for graphs this size")
    val bc = spark.sparkContext.broadcast(csr)
    try {
      spark.sparkContext
        .parallelize(alphas, math.max(1, alphas.length))
        .flatMap { a =>
          val g = bc.value
          val n = g.numNodes
          var x = Array.fill(n)(1.0)
          var it = 0
          while (it < iterations) {
            val acc = new Array[Double](n)
            var u = 0
            while (u < n) {
              val xu = x(u)
              val d = g.outDegree(u)
              var j = 0
              while (j < d) { acc(g.neighbor(u, j)) += xu * a; j += 1 }
              u += 1
            }
            var v = 0
            while (v < n) { acc(v) = 1.0 + acc(v); v += 1 }
            x = acc
            it += 1
          }
          x.iterator.zipWithIndex.map { case (xv, v) =>
            (a, g.originalOf(v), xv)
          }
        }
        .collect().toSeq
        .toDF("alpha", "node_id", "katz")
    } finally bc.unpersist(false)
  }

  /** DuckDB oracle: the identical fixed schedule as unrolled CTEs.
    * `graphSql` must yield `(src, dst)`; output `(node_id, katz)`
    * rounded to `roundTo` — the [[graft.ppr.PageRank.oracleSql]]
    * discipline with the dangling/base machinery deleted.
    */
  def oracleSql(graphSql: String, alpha: Double, iterations: Int,
      roundTo: Int = 9): String = {
    val sb = new StringBuilder
    sb ++= s"WITH edges AS MATERIALIZED ($graphSql),\n"
    sb ++= "nodes AS MATERIALIZED (SELECT src AS id FROM edges " +
      "UNION SELECT dst FROM edges),\n"
    // literals CAST to DOUBLE: a bare 1.0 is DECIMAL in DuckDB and the
    // whole recurrence (and the final round()) would widen to
    // DECIMAL(38,9) — a driver-hash type mismatch vs Spark's DOUBLE
    sb ++= "x0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS x " +
      "FROM nodes),\n"
    for (i <- 1 to iterations) {
      val prev = s"x${i - 1}"
      sb ++= s"p$i AS MATERIALIZED (SELECT e.dst AS id, " +
        s"sum(t.x * CAST($alpha AS DOUBLE)) AS p FROM edges e " +
        s"JOIN $prev t ON e.src = t.id GROUP BY e.dst),\n"
      sb ++= s"x$i AS MATERIALIZED (SELECT nodes.id, " +
        s"CAST(1.0 AS DOUBLE) + coalesce(p$i.p, CAST(0.0 AS DOUBLE)) AS x " +
        s"FROM nodes LEFT JOIN p$i ON p$i.id = nodes.id),\n"
    }
    sb.setLength(sb.length - 2)
    sb ++= "\n"
    sb ++= s"SELECT id AS node_id, round(x, $roundTo) AS katz FROM x$iterations"
    sb.toString
  }
}
