package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}

/** K-source truncated betweenness centrality — Brandes' algorithm
  * (Brandes 2001) over a FIXED source set and a FIXED depth horizon, the
  * batch-CSR regime shared with [[Bfs.batch]]: the graph snapshot
  * broadcasts once, sources fan out over tasks, each task runs one
  * linear-time forward BFS (exact BIGINT shortest-path counts σ) and one
  * backward dependency sweep, and emits only `(source, node, δ)` rows.
  * bc(v) = Σ_s δ_s(v) then folds as an ordinary aggregation. Past the
  * broadcast envelope the forward pass is the [[Bfs]] superstep loop and
  * the backward pass one per-level join cascade — the fixed horizon is
  * what keeps that a bounded schedule at any scale.
  *
  * Truncated semantics (both engines replay it EXACTLY): the shortest-
  * path DAG is cut at `maxDepth` — σ over ≤-depth shortest paths, nodes
  * AT the horizon carry δ = 0 (their downstream dependency is outside
  * the window), and levels accumulate descending:
  *
  *   δ(v) = Σ_{v→w, dist(w)=dist(v)+1} σ(v)/σ(w) · (1 + δ(w))
  *
  * FLOAT DISCIPLINE (the ev_markov_entropy fold): every δ is a sum of
  * IEEE addends folded in ASCENDING VALUE order — the task sorts its
  * addend array, the DuckDB oracle folds `list(a ORDER BY a)` — and the
  * final bc folds each node's per-source δ list the same way, so the
  * 4-deep float chain is bit-identical cross-engine (a value-sorted
  * multiset has ONE fold result; tie order is irrelevant to the sum).
  * σ ratios divide exact BIGINTs, so the addends themselves are
  * bit-identical inputs.
  */
object Betweenness {

  /** One truncated Brandes pass per source over the broadcast CSR;
    * emits `(source, node_id, delta)` for every reached non-source node
    * (δ = 0 leaves included — bc aggregation needs the zero addends).
    */
  def deltas(
      spark: SparkSession,
      csr: Csr,
      sources: Seq[Long],
      maxDepth: Int): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(csr)
    val nSlices = math.min(math.max(1, sources.length),
      spark.sparkContext.defaultParallelism)
    spark.sparkContext
      .parallelize(sources, nSlices)
      .flatMap { s =>
        val g = bc.value
        val sd = g.denseOf(s)
        if (sd < 0) Iterator.empty
        else {
          val n = g.numNodes
          val dist = new Array[Int](n)
          java.util.Arrays.fill(dist, -1)
          val sigma = new Array[Long](n)
          val levels = Array.fill(maxDepth + 1)(
            new scala.collection.mutable.ArrayBuffer[Int]())
          dist(sd) = 0
          sigma(sd) = 1L
          levels(0) += sd
          var d = 0
          while (d < maxDepth && levels(d).nonEmpty) {
            levels(d).foreach { v =>
              g.foreachNeighbor(v) { w =>
                if (dist(w) < 0) { dist(w) = d + 1; levels(d + 1) += w }
                if (dist(w) == d + 1) sigma(w) += sigma(v)
              }
            }
            d += 1
          }
          val delta = new Array[Double](n)
          val top = math.min(maxDepth, d)
          var l = top - 1
          while (l >= 1) {
            levels(l).foreach { v =>
              val adds = new scala.collection.mutable.ArrayBuffer[Double]()
              g.foreachNeighbor(v) { w =>
                if (dist(w) == l + 1)
                  adds += sigma(v).toDouble / sigma(w).toDouble *
                    (1.0 + delta(w))
              }
              val sorted = adds.toArray
              java.util.Arrays.sort(sorted)
              var acc = 0.0
              var i = 0
              while (i < sorted.length) { acc += sorted(i); i += 1 }
              delta(v) = acc
            }
            l -= 1
          }
          (0 until n).iterator.collect {
            case v if dist(v) >= 1 => (s, g.originalOf(v), delta(v))
          }
        }
      }
      .toDF("source", "node_id", "delta")
  }

  /** bc(v) = value-sorted fold of the per-source δ's, rounded to 6 dp. */
  def batch(
      spark: SparkSession,
      csr: Csr,
      sources: Seq[Long],
      maxDepth: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    deltas(spark, csr, sources, maxDepth)
      .groupBy(col("node_id"))
      .agg(expr("round(aggregate(sort_array(collect_list(delta)), " +
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x), 6)").as("bc"))
  }

  /** DuckDB oracle: the identical truncated schedule as unrolled CTEs —
    * forward levels `l1..lD` (exact-level frontier via anti-join against
    * the visited union, σ as an exact BIGINT sum over level-(i−1)
    * predecessors) and backward dependencies `dl{D-1}..dl1`, every float
    * fold over `list(a ORDER BY a)`. `graphSql` must yield `(src, dst)`.
    */
  def oracleSql(graphSql: String, sources: Seq[Long], maxDepth: Int): String = {
    val values = sources.map(s => s"($s)").mkString(", ")
    val fold = "(acc, x) -> acc + x"
    val sb = new StringBuilder
    sb ++= s"WITH e AS MATERIALIZED ($graphSql),\n"
    sb ++= "nodes AS MATERIALIZED (SELECT src AS id FROM e " +
      "UNION SELECT dst FROM e),\n"
    sb ++= "l0 AS MATERIALIZED (SELECT CAST(s AS BIGINT) AS src, " +
      s"CAST(s AS BIGINT) AS id, CAST(1 AS BIGINT) AS sigma " +
      s"FROM (VALUES $values) v(s) WHERE s IN (SELECT id FROM nodes)),\n"
    sb ++= "v0 AS MATERIALIZED (SELECT src, id FROM l0),\n"
    for (i <- 1 to maxDepth) {
      val p = i - 1
      sb ++= s"l$i AS MATERIALIZED (SELECT p.src, e.dst AS id, " +
        s"CAST(sum(p.sigma) AS BIGINT) AS sigma " +
        s"FROM l$p p JOIN e ON e.src = p.id " +
        s"WHERE NOT EXISTS (SELECT 1 FROM v$p v " +
        s"WHERE v.src = p.src AND v.id = e.dst) " +
        s"GROUP BY p.src, e.dst),\n"
      sb ++= s"v$i AS MATERIALIZED (SELECT src, id FROM v$p " +
        s"UNION ALL SELECT src, id FROM l$i),\n"
    }
    sb ++= s"dl$maxDepth AS MATERIALIZED (SELECT src, id, " +
      s"CAST(0 AS DOUBLE) AS delta FROM l$maxDepth),\n"
    for (l <- (maxDepth - 1) to 1 by -1) {
      val w = l + 1
      sb ++= s"a$l AS MATERIALIZED (SELECT v.src, v.id, " +
        s"CAST(v.sigma AS DOUBLE) / w.sigma * " +
        s"(CAST(1.0 AS DOUBLE) + w.delta) AS a " +
        s"FROM l$l v JOIN e ON e.src = v.id " +
        s"JOIN (SELECT x.src, x.id, x.sigma, d.delta FROM l$w x " +
        s"JOIN dl$w d ON d.src = x.src AND d.id = x.id) w " +
        s"ON w.src = v.src AND w.id = e.dst),\n"
      sb ++= s"dl$l AS MATERIALIZED (SELECT v.src, v.id, " +
        s"coalesce(s.delta, CAST(0 AS DOUBLE)) AS delta FROM l$l v " +
        s"LEFT JOIN (SELECT src, id, list_reduce(list_prepend(" +
        s"CAST(0 AS DOUBLE), list(a ORDER BY a)), $fold) AS delta " +
        s"FROM a$l GROUP BY src, id) s " +
        s"ON s.src = v.src AND s.id = v.id),\n"
    }
    sb ++= "alld AS MATERIALIZED (" +
      (1 to maxDepth).map(l => s"SELECT src, id, delta FROM dl$l")
        .mkString(" UNION ALL ") + ")\n"
    sb ++= "SELECT id AS node_id, round(list_reduce(list_prepend(" +
      s"CAST(0 AS DOUBLE), list(delta ORDER BY delta)), $fold), 6) AS bc " +
      "FROM alld GROUP BY id"
    sb.toString
  }
}
