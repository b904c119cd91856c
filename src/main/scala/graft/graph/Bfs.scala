package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Depth-limited multi-source BFS — hop-distance labeling, the traversal
  * primitive under ego-network features, reachability filters, and the
  * `g_khop` expansion counts (dist=1 nodes are exactly the 1-hop
  * neighborhood; dist≤2 the within-2 set).
  *
  * Architecture: the batch-CSR regime shared with
  * [[graft.ppr.PowerIteration.batch]] — the graph snapshot broadcasts
  * once, sources fan out over tasks, each task runs a linear-time array
  * BFS and emits only reached `(source, node_id, dist)` rows. The
  * fits-in-broadcast guard is the same ≲1e9-edge envelope documented on
  * [[Csr]]; past it, hop distance is the [[ConnectedComponents]]-style
  * superstep loop (state `(id, dist)`, per-round min-plus join), which
  * this kernel's fixed-depth semantics were chosen to match exactly.
  *
  * Depth is FIXED (`maxDepth`), so the DuckDB oracle replays the
  * identical schedule as unrolled min-plus rounds: after K rounds,
  * `dist(v)` = length of the shortest path using ≤ K hops — identical to
  * a BFS cut off at depth K, whatever order either engine visits nodes.
  */
object Bfs {

  /** One BFS per source over the broadcast CSR; rows only for nodes with
    * `dist(source, node) <= maxDepth`. Sources absent from the graph
    * produce no rows (mirrored by the membership filter in [[oracleSql]]).
    */
  def batch(
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
          var frontier = new Array[Int](1)
          frontier(0) = sd
          dist(sd) = 0
          var d = 0
          while (d < maxDepth && frontier.length > 0) {
            val next = new scala.collection.mutable.ArrayBuffer[Int]()
            var i = 0
            while (i < frontier.length) {
              g.foreachNeighbor(frontier(i)) { v =>
                if (dist(v) < 0) { dist(v) = d + 1; next += v }
              }
              i += 1
            }
            frontier = next.toArray
            d += 1
          }
          (0 until n).iterator.collect {
            case v if dist(v) >= 0 => (s, g.originalOf(v), dist(v))
          }
        }
      }
      .toDF("source", "node_id", "dist")
  }

  /** DuckDB oracle: `maxDepth` unrolled min-plus rounds over the same
    * edge list. `graphSql` must yield `(src, dst)`.
    */
  def oracleSql(graphSql: String, sources: Seq[Long], maxDepth: Int): String = {
    val values = sources.map(s => s"($s)").mkString(", ")
    val sb = new StringBuilder
    sb ++= s"WITH e AS MATERIALIZED ($graphSql),\n"
    sb ++= "nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),\n"
    sb ++= "d0 AS MATERIALIZED (SELECT CAST(s AS BIGINT) AS src, " +
      s"CAST(s AS BIGINT) AS id, 0 AS dist FROM (VALUES $values) v(s) " +
      "WHERE s IN (SELECT id FROM nodes)),\n"
    for (i <- 1 to maxDepth) {
      val prev = s"d${i - 1}"
      sb ++= s"d$i AS MATERIALIZED (SELECT src, id, min(dist) AS dist FROM (" +
        s"SELECT src, id, dist FROM $prev " +
        s"UNION ALL SELECT p.src, e.dst AS id, p.dist + 1 " +
        s"FROM $prev p JOIN e ON e.src = p.id) u GROUP BY src, id),\n"
    }
    sb.setLength(sb.length - 2)
    sb ++= s"\nSELECT src AS source, id AS node_id, dist FROM d$maxDepth"
    sb.toString
  }
}
