package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.graph.{Got, GraphOps}
import graft.ppr.PowerIteration

/** The reference's own fixture, end to end: GOT CSV import (S1/S2),
  * name↔id resolution (P5/J5), symmetrize, PPR, top-k with names — the
  * exact demo flow of `README.md:19-31` / `PPR.java:154-200` with the
  * reference GOT defaults (α=0.15, k=10).
  *
  * These queries ignore the driver's sfDir: the fixture path is part of
  * the operator (the reference hard-codes `target/got.db` the same way).
  */
object GotQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+S2+J5: load, resolve names→ids, symmetrize.
    "got_edges" -> ((s, _) => Got.edges(s)),

    // K1 on the GOT graph from Arya + T2 tie-inclusive top-k + P5 name
    // projection: "top-10 most PPR-similar characters to Arya".
    "got_ppr_topk" -> ((s, _) => {
      val csr = GraphOps.buildCsr(Got.edges(s))
      val ppr = PowerIteration.batch(s, csr, Seq(Got.AryaId), Got.Alpha, Got.Iters)
        .select(col("node_id"), round(col("score"), 9).as("score"))
      val ranked = ppr
        .withColumn("rk", rank().over(Window.orderBy(col("score").desc)))
        .where(col("rk") <= Got.TopK)
      ranked
        .join(broadcast(Got.nodes(s).select(col("id"), col("name"))),
          ranked("node_id") === col("id"))
        .select(col("name"), col("score"), col("rk"))
    })
  )

  def oracleSql: Map[String, String] = {
    val multi = PowerIteration.oracleSqlMulti(
      Got.edgesSql(), Seq(Got.AryaId), Got.Alpha, Got.Iters)
    Map(
      "got_edges" -> Got.edgesSql(),
      "got_ppr_topk" ->
        s"""WITH ppr AS MATERIALIZED ($multi),
           |got_nodes AS (${Got.nodesSql()})
           |SELECT n.name, p.score, p.rk FROM
           |  (SELECT node_id, score, rank() OVER (ORDER BY score DESC) AS rk
           |   FROM ppr) p
           |JOIN got_nodes n ON n.id = p.node_id
           |WHERE p.rk <= ${Got.TopK}""".stripMargin
    )
  }
}
