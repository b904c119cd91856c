package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.graph.GraphOps
import graft.ppr.PowerIteration

/** Graph/PPR operator coverage over the deterministic lineitem-derived
  * benchmark graph (see [[GraphOps.lineitemGraph]]). Power iteration is the
  * reference's exact oracle (K1); its unrolled-SQL DuckDB oracle makes it
  * the one iterative kernel the driver can hash-check end to end
  * (SURVEY §5.2.3). Scores are rounded to 9 decimals on both sides —
  * cross-engine summation-order noise is ~1e-15.
  */
object Graph {

  val Mod = 997
  val Alpha = 0.15
  val Iters = 25
  val SingleSource = 1L
  val BatchSources: Seq[Long] = Seq(1L, 2L, 3L, 5L, 8L)
  val TopK = 10

  private def graphSql: String = GraphOps.lineitemGraphSql(Mod)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S4: graph load/derivation itself.
    "g_edges" -> ((s, dir) => GraphOps.lineitemGraph(s, dir, Mod)),

    // A1: out-degree aggregate.
    "g_degree" -> ((s, dir) =>
      GraphOps.outDegrees(GraphOps.lineitemGraph(s, dir, Mod))),

    // K1 distributed: single-source PPR by DataFrame superstep loop.
    "g_power_ppr" -> ((s, dir) => {
      val edges = GraphOps.lineitemGraph(s, dir, Mod)
      PowerIteration.run(s, edges, SingleSource, Alpha, Iters)
        .select(col("node_id"), round(col("score"), 9).as("score"))
    }),

    // K1 batched: multi-source PPR over broadcast CSR (zero per-iteration
    // shuffle; the 100 TB-shaped strategy for batch workloads).
    "g_ppr_batch" -> ((s, dir) => {
      val csr = GraphOps.buildCsr(GraphOps.lineitemGraph(s, dir, Mod))
      PowerIteration.batch(s, csr, BatchSources, Alpha, Iters)
        .select(col("src"), col("node_id"), round(col("score"), 9).as("score"))
    }),

    // T2: tie-inclusive top-k per source via RANK on the rounded score.
    "g_ppr_topk" -> ((s, dir) => {
      val csr = GraphOps.buildCsr(GraphOps.lineitemGraph(s, dir, Mod))
      val ppr = PowerIteration.batch(s, csr, BatchSources, Alpha, Iters)
        .select(col("src"), col("node_id"), round(col("score"), 9).as("score"))
      val w = Window.partitionBy(col("src")).orderBy(col("score").desc)
      ppr.withColumn("rk", rank().over(w)).where(col("rk") <= TopK)
    })
  )

  def oracleSql: Map[String, String] = {
    val multi = PowerIteration.oracleSqlMulti(graphSql, BatchSources, Alpha, Iters)
    Map(
      "g_edges" -> graphSql,
      "g_degree" -> s"SELECT src AS id, count(*) AS deg FROM ($graphSql) GROUP BY src",
      "g_power_ppr" -> PowerIteration.oracleSql(graphSql, SingleSource, Alpha, Iters),
      "g_ppr_batch" -> multi,
      "g_ppr_topk" ->
        s"""SELECT src, node_id, score, rk FROM (
           | SELECT src, node_id, score,
           |  rank() OVER (PARTITION BY src ORDER BY score DESC) AS rk
           | FROM ($multi)) WHERE rk <= $TopK""".stripMargin
    )
  }
}
