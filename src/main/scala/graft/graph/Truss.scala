package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K-truss — the edge-granular companion of the `g_kcore` node peel
  * (Cohen 2008): repeatedly delete every edge whose SUPPORT (number of
  * triangles it closes within the surviving subgraph) is below k−2,
  * until the fixed round horizon; report the surviving edges with their
  * in-truss support. Like `g_kcore`/LPA/CC, the horizon is part of the
  * operator's semantics and the DuckDB oracle ([[oracleSql]]) replays
  * it as unrolled CTE rounds; peeling is monotone (survivors of round r
  * are a subset of round r−1), so once a round drops nothing every later
  * round is a no-op and a fixed horizon with spare rounds is exact
  * (TrussSpec asserts the fixpoint is reached inside the budget).
  *
  * Per round the plan is the `g_triangles` body re-run on the survivors:
  * degree-ordered orientation (each triangle enumerated ONCE at its
  * lowest-(degree, id) apex — O(√m) oriented out-degrees bound the wedge
  * join even on power-law graphs), closure via one semi-join, then each
  * triangle fans out to its THREE canonical edges and the support fold
  * is one map-side-combined integer count on the (a, b) key. Support
  * counts are exact integers and enumeration-order-free, so the Spark
  * degree-ordered enumeration and the oracle's id-ordered (a<b<c)
  * enumeration cannot desync. The loop early-exits on a detected
  * fixpoint (count unchanged ⟹ set unchanged, by monotonicity) — a pure
  * optimization with identical output to the full unrolled horizon.
  *
  * Scale shape: each round is joins + one aggregate over the CURRENT
  * survivor set — the first round dominates (full triangle count), later
  * rounds shrink with the truss; state never collects to the driver, and
  * the per-round localCheckpoint keeps lineage flat (the CC/LPA
  * iterative economics).
  */
object Truss {

  /** Per-edge triangle support over an `(a, b)` (a<b, distinct)
    * undirected edge set: `(a, b, sup)` for every edge closing ≥1
    * triangle (support-0 edges emit no row — they are exactly the edges
    * every k≥3 truss drops first).
    */
  private[graft] def support(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("dg"))
    val oriented = und
      .join(deg.select(col("id").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("dg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
      .localCheckpoint(true) // both sides of the wedge self-join
    val tri = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.u").as("ta"), col("x.v").as("tb"), col("y.v").as("tc"))
      .join(und.select(col("a").as("tb"), col("b").as("tc")),
        Seq("tb", "tc"), "left_semi")
      .localCheckpoint(true) // fans out to three edge streams
    tri.select(least(col("ta"), col("tb")).as("a"),
        greatest(col("ta"), col("tb")).as("b"))
      .unionAll(tri.select(least(col("ta"), col("tc")).as("a"),
        greatest(col("ta"), col("tc")).as("b")))
      .unionAll(tri.select(least(col("tb"), col("tc")).as("a"),
        greatest(col("tb"), col("tc")).as("b")))
      .groupBy("a", "b").agg(count(lit(1)).as("sup"))
  }

  /** Fixed-horizon k-truss over an `(a, b)` a<b distinct edge set.
    * Returns `(a, b, sup)` — the surviving edges with support computed
    * over the final survivor set (at a reached fixpoint, every reported
    * sup ≥ k−2 by construction).
    */
  def run(spark: SparkSession, und0: DataFrame, k: Int, rounds: Int,
      onRound: (Int, Long) => Unit = (_, _) => ()): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    var und = und0.localCheckpoint(true)
    var m = und.count()
    var lastSup: DataFrame = null
    var converged = false
    var r = 0
    while (r < rounds && !converged) {
      val sup = support(und).where(col("sup") >= k - 2)
        .localCheckpoint(true)
      val m2 = sup.count()
      onRound(r + 1, m2)
      und = sup.select(col("a"), col("b"))
      // monotone peel: unchanged count ⟹ unchanged set ⟹ fixpoint, and
      // sup (computed over the identical previous set) IS the answer.
      converged = m2 == m
      m = m2
      lastSup = sup
      r += 1
    }
    if (converged) lastSup
    else support(und) // horizon exhausted pre-fixpoint: support over e_R
  }

  /** DuckDB oracle: the identical fixed horizon as unrolled CTE rounds —
    * per round the id-ordered (a<b<c) triangle enumeration, the 3-edge
    * fan-out support fold, and the ≥ k−2 filter; the final SELECT
    * recomputes support over the last survivor set (at a fixpoint this
    * equals the last round's filtered table — the same statement
    * [[run]]'s early-exit relies on). `undSql` must yield a distinct
    * `(a, b)` a<b edge set.
    */
  def oracleSql(undSql: String, k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"WITH e0 AS MATERIALIZED ($undSql),\n"
    for (i <- 0 to rounds) {
      val out = if (i == rounds) "sf" else s"s${i + 1}"
      sb ++= s"t$out AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, " +
        s"e2.b AS z FROM e$i e1 JOIN e$i e2 ON e2.a = e1.b " +
        s"WHERE EXISTS (SELECT 1 FROM e$i e3 " +
        s"WHERE e3.a = e1.a AND e3.b = e2.b)),\n"
      sb ++= s"$out AS MATERIALIZED (SELECT a, b, count(*) AS sup FROM (" +
        s"SELECT x AS a, y AS b FROM t$out " +
        s"UNION ALL SELECT y, z FROM t$out " +
        s"UNION ALL SELECT x, z FROM t$out) GROUP BY a, b)"
      if (i < rounds)
        sb ++= s",\ne${i + 1} AS MATERIALIZED (SELECT a, b FROM $out " +
          s"WHERE sup >= ${k - 2}),\n"
      else sb ++= "\n"
    }
    sb ++= "SELECT a, b, sup FROM sf"
    sb.toString
  }
}
