package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ppr.PowerIteration

/** Depth-limited multi-source BFS — hop-distance labeling, the traversal
  * primitive under ego-network features, reachability filters, and the
  * `g_khop` expansion counts (dist=1 nodes are exactly the 1-hop
  * neighborhood; dist≤2 the within-2 set).
  *
  * TWO-REGIME ([[run]] dispatch, the [[ConnectedComponents.run]]
  * philosophy): under [[Betweenness.LocalEdgeLimit]] the batch-CSR
  * regime shared with [[graft.ppr.PowerIteration.batch]] — the graph
  * snapshot broadcasts once, sources fan out over tasks, each task runs
  * a linear-time array BFS and emits only reached
  * `(source, node_id, dist)` rows. Past it, [[runSupersteps]]: the
  * level-synchronous frontier loop with state `(source, id, dist)` —
  * per level ONE frontier⋈edges shuffle + one anti-join against the
  * visited set, no driver collect anywhere. Both regimes return the
  * same frame exactly (integer distances have no accumulation-order
  * freedom; BfsSpec pins the equality).
  *
  * Depth is FIXED (`maxDepth`), so the DuckDB oracle replays the
  * identical schedule as unrolled min-plus rounds: after K rounds,
  * `dist(v)` = length of the shortest path using ≤ K hops — identical to
  * a BFS cut off at depth K, whatever order either engine visits nodes
  * (first-discovery level = min-plus fixpoint at that horizon).
  */
object Bfs {

  /** Two-regime dispatch over an `(src, dst)` edge DataFrame; `csrOf`
    * and `edgeCount` as in [[Betweenness.run]] (memoized-snapshot and
    * snapshot-metadata hooks).
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      sources: Seq[Long],
      maxDepth: Int,
      csrOf: DataFrame => Csr = GraphOps.buildCsr,
      edgeCount: Option[Long] = None): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val m = edgeCount.getOrElse { e.persist(); e.count() }
    val out =
      if (m <= Betweenness.LocalEdgeLimit)
        batch(spark, csrOf(e), sources, maxDepth)
      else runSupersteps(spark, e, sources, maxDepth)
    if (edgeCount.isEmpty) e.unpersist()
    out
  }

  /** The past-one-machine regime: `maxDepth` level-synchronous frontier
    * rounds — candidates = frontier ⋈ edges, deduped per (source, dst),
    * anti-joined against the visited union (first discovery wins, which
    * IS the min-plus round-r fixpoint). State frames chain through eager
    * localCheckpoints, released once the output materializes.
    */
  def runSupersteps(
      spark: SparkSession,
      edges: DataFrame,
      sources: Seq[Long],
      maxDepth: Int): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    val held = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
    def ck(df: DataFrame): DataFrame = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      held += (sc.getPersistentRDDs.keySet -- before).toSet
      out
    }
    val e0 = edges.select(col("src"), col("dst"))
    val m = e0.count()
    val p = math.min(sc.defaultParallelism.toLong, m / 1000000L + 1L).toInt
    val e = ck(e0.repartition(p, col("src")))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevCodegen = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      if (p == 1) spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val n = e.select(col("src")).distinct().count()
      val small = n <= PowerIteration.BroadcastNodeLimit
      def sided(df: DataFrame): DataFrame = if (small) broadcast(df) else df

      val srcDf = sources.distinct.toDF("source")
        .join(sided(e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id"))).distinct()),
          col("source") === col("id"), "left_semi")
      var frontier = ck(srcDf.select(col("source"),
        col("source").as("id"), lit(0).as("dist")))
      var state = frontier
      var d = 1
      while (d <= maxDepth) {
        val cand = e.join(sided(frontier), e("src") === frontier("id"))
          .select(frontier("source").as("source"), e("dst").as("id"))
          .distinct()
        frontier = ck(cand
          .join(sided(state.select(col("source"), col("id"))),
            Seq("source", "id"), "left_anti")
          .select(col("source"), col("id"), lit(d).as("dist")))
        state = ck(state.union(frontier))
        d += 1
      }
      val out = state.select(col("source"), col("id").as("node_id"),
        col("dist"))
      val pinned = out.localCheckpoint(true)
      held.foreach(_.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))))
      pinned
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.codegen.wholeStage", prevCodegen)
    }
  }

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
