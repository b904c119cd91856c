package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ppr.PowerIteration

/** HITS hubs & authorities (Kleinberg 1999, JACM 46(5) §3) — the
  * mutually-recursive global ranking pair alongside [[graft.ppr.PageRank]]:
  * per iteration the authority score is the sum of incoming hub scores
  * and the hub score the sum of outgoing authority scores; the reported
  * vectors are L1-normalized. Each half-step is LINEAR, so per-step
  * normalization only multiplies by a scalar — normalizing ONCE at the
  * end yields the identical normalized vectors while deleting a 1-row
  * aggregate + cross join from every half-step (12 fewer plan nodes per
  * run); the unnormalized magnitudes grow by ~avg-degree per half-step,
  * bounded by deg^(2·iters) ≪ double range for any fixed schedule this
  * library runs (a deep-schedule variant would renormalize periodically
  * — documented, not needed at iterations ≤ ~100 on any real degree).
  * The iteration count is FIXED — the schedule is the semantics,
  * replayed exactly by the unrolled-CTE oracle over the same
  * unnormalized chain — and the end-state rounds to 9 dp on both
  * engines (the [[graft.ppr.PowerIteration]] float-noise dispensation:
  * cross-engine summation-order noise ~1e-15 relative).
  *
  * Scale shape (the [[graft.ppr.PageRank.run]] economics): one
  * map-side-combined shuffle per half-step — contributions union a zero
  * carrier so every node survives with score 0 when it has no in-
  * (resp. out-) edges (adding 0.0 leaves float sums bit-identical, the
  * PageRank carrier argument) — and the state localCheckpoints per
  * half-step with generation N−1 released as N materializes, one
  * [[graft.operators.CkptChain]] PER vector (hub gen N derives from
  * auth gen N, which must stay pinned for the final join). Cost is
  * iterations × the job floor, independent of graph size.
  */
object Hits {

  /** Distributed HITS over an `(src, dst)` edge list. Returns
    * `(node_id LONG, hub DOUBLE, auth DOUBLE)` for every node,
    * L1-normalized, unrounded (callers round for cross-engine compare).
    */
  def run(spark: SparkSession, edges: DataFrame, iterations: Int): DataFrame = {
    val sc = spark.sparkContext
    // tracked setup checkpoints, released in the finally (the PageRank
    // discipline): the returned DataFrame's final generations no longer
    // reference nodes/ew, so a long-lived session must not keep them.
    def trackedCkpt(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def release(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))

    val e = edges.persist()
    val (nodes, nodesIds) = trackedCkpt(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct())
    val m = e.count()
    // shuffle width scoped to graph size (the PowerIteration rationale)
    val p = math.min(sc.defaultParallelism.toLong, m / 1000000L + 1L).toInt
    val (ew, ewIds) = trackedCkpt(e.repartition(p, col("src")))
    e.unpersist()
    val n = nodes.count().toDouble

    // one chain PER state vector (the CkptChain contract): hub gen N
    // derives from auth gen N, which must stay pinned until the final
    // join — a single shared chain would release it underneath.
    val ckptHub = new graft.operators.CkptChain(sc)
    val ckptAuth = new graft.operators.CkptChain(sc)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevCodegen = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      if (p == 1) spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val small = n <= PowerIteration.BroadcastNodeLimit
      def sided(df: DataFrame): DataFrame = if (small) broadcast(df) else df
      val carrier = nodes.select(col("id"), lit(0.0).as("c"))

      // one half-step = ONE job: push `s` across `ew` in direction
      // (from, to), fold with the zero carrier in a single groupBy.
      def halfStep(state: DataFrame, from: String, to: String,
          chain: graft.operators.CkptChain): DataFrame =
        chain(ew.join(sided(state), ew(from) === state("id"))
          .select(ew(to).as("id"), col("s").as("c"))
          .union(carrier)
          .groupBy("id").agg(sum(col("c")).as("s")))

      var hub = ckptHub(nodes.select(col("id"), lit(1.0).as("s")))
      var auth: DataFrame = null
      var it = 0
      while (it < iterations) {
        auth = halfStep(hub, "src", "dst", ckptAuth) // a_i = Σ_in h_{i-1}
        hub = halfStep(auth, "dst", "src", ckptHub) // h_i = Σ_out a_i
        it += 1
      }
      // single trailing L1 normalization: two 1-row totals cross-join
      // into the score join (plain cross joins on the small path — one
      // job; broadcast at scale, the PageRank dm discipline).
      val totH0 = hub.agg(sum(col("s")).as("th"))
      val totA0 = auth.agg(sum(col("s")).as("ta"))
      val (totH, totA) =
        if (small) (totH0, totA0) else (broadcast(totH0), broadcast(totA0))
      hub.withColumnRenamed("s", "hraw")
        .join(auth.withColumnRenamed("s", "araw")
          .withColumnRenamed("id", "aid"), col("id") === col("aid"))
        .crossJoin(totH).crossJoin(totA)
        .select(col("id").as("node_id"),
          (col("hraw") / col("th")).as("hub"),
          (col("araw") / col("ta")).as("auth"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.codegen.wholeStage", prevCodegen)
      // the returned plan reads only the final hub/auth generations
      release(nodesIds)
      release(ewIds)
    }
  }

  /** DuckDB oracle: the identical fixed unnormalized schedule as
    * unrolled CTEs. Expression shapes mirror [[run]] half-step for
    * half-step: raw sums LEFT-join onto the node table (coalesce 0 = the
    * carrier), one trailing L1 division per vector. Output rounds to
    * `roundTo`.
    */
  def oracleSql(graphSql: String, iterations: Int, roundTo: Int = 9): String = {
    val sb = new StringBuilder
    sb ++= s"WITH edges AS MATERIALIZED ($graphSql),\n"
    sb ++= "nodes AS MATERIALIZED (SELECT src AS id FROM edges " +
      "UNION SELECT dst FROM edges),\n"
    sb ++= "h0 AS MATERIALIZED (SELECT id, 1.0 AS s FROM nodes),\n"
    for (i <- 1 to iterations) {
      sb ++= s"a$i AS MATERIALIZED (SELECT nodes.id, " +
        s"coalesce(p.s, 0.0) AS s FROM nodes LEFT JOIN (" +
        s"SELECT e.dst AS id, sum(t.s) AS s FROM edges e " +
        s"JOIN h${i - 1} t ON e.src = t.id GROUP BY e.dst) p " +
        s"ON p.id = nodes.id),\n"
      sb ++= s"h$i AS MATERIALIZED (SELECT nodes.id, " +
        s"coalesce(p.s, 0.0) AS s FROM nodes LEFT JOIN (" +
        s"SELECT e.src AS id, sum(t.s) AS s FROM edges e " +
        s"JOIN a$i t ON e.dst = t.id GROUP BY e.src) p " +
        s"ON p.id = nodes.id),\n"
    }
    sb.setLength(sb.length - 2)
    sb ++= "\n"
    sb ++= s"SELECT h.id AS node_id, " +
      s"round(h.s / (SELECT sum(s) FROM h$iterations), $roundTo) AS hub, " +
      s"round(a.s / (SELECT sum(s) FROM a$iterations), $roundTo) AS auth " +
      s"FROM h$iterations h JOIN a$iterations a ON a.id = h.id"
    sb.toString
  }
}
