package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label-propagation communities (Raghavan et al. 2007) in
  * the DETERMINISTIC variant a reproducible pipeline needs: every node
  * starts labeled with its own id; each round every node adopts the most
  * frequent label among its neighbors, ties broken to the SMALLEST
  * label; the horizon is a FIXED round count rather than convergence
  * (sync LPA can 2-cycle on bipartite structure, so a convergence-
  * defined output would not be well-defined — a fixed even/odd horizon
  * is). No randomness anywhere, unlike the classic async formulation.
  *
  * Scale shape: per round ONE shuffle — the (node, label) candidate
  * count is a map-side-combined groupBy on the node id, and the argmax
  * cut is a per-node row_number window (WindowGroupLimit-eligible, rn=1
  * filter directly on top). The undirected edge set and each round's
  * label table are checkpointed so round r+1 does not re-derive round r
  * from the raw scan — the same superstep hygiene as PowerIteration.
  */
object LabelProp {

  def run(spark: SparkSession, edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val und = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // symmetrized src column covers every node
    var labels = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      labels = step(und, labels).localCheckpoint(true)
    }
    labels
  }

  /** One synchronous round: neighbor-label candidate counts (map-side-
    * combined groupBy) + the rn=1 argmax cut. Exposed pre-checkpoint so
    * LabelPropSpec can assert the cut compiles to WindowGroupLimit (the
    * map-side per-group limit) rather than a full per-node window sort.
    */
  private[graft] def step(und: DataFrame, labels: DataFrame): DataFrame = {
    val cand = und
      .join(labels.withColumnRenamed("id", "src"), Seq("src"))
      .select(col("dst").as("id"), col("label"))
    cand.groupBy(col("id"), col("label"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("c").desc, col("label").asc)))
      .where(col("rn") === 1)
      .select(col("id"), col("label"))
  }

  /** DuckDB oracle: the same rounds unrolled as CTEs over the same edge
    * derivation.
    */
  def oracleSql(graphSql: String, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH e0 AS MATERIALIZED ($graphSql),
       |und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0) u),
       |l0 AS (SELECT DISTINCT src AS id, src AS label FROM und),
       |""".stripMargin
    for (r <- 1 to rounds) {
      val p = r - 1
      sb ++= s"""c$r AS (SELECT u.dst AS id, l.label, count(*) AS c
         |  FROM und u JOIN l$p l ON l.id = u.src GROUP BY 1, 2),
         |l$r AS MATERIALIZED (SELECT id, label FROM (
         |  SELECT id, label, row_number() OVER (PARTITION BY id
         |    ORDER BY c DESC, label ASC) AS rn FROM c$r) WHERE rn = 1),
         |""".stripMargin
    }
    sb ++= s"fin AS (SELECT 1 AS one)\nSELECT id, label FROM l$rounds"
    sb.toString
  }
}
