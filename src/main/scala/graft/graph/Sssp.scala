package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ppr.PowerIteration

/** Bounded-hop weighted shortest paths — the min-plus sibling of [[Bfs]]:
  * `dist(s, v)` = minimum total edge weight over paths of at most
  * `maxHops` edges. The hop bound makes the schedule FIXED, so the DuckDB
  * oracle replays it exactly as unrolled min-plus rounds, and both
  * engines produce bit-identical doubles: every ≤K-edge path's cost is
  * the same left-to-right sum in either engine, and `min` (unlike a sum
  * over unordered rows) has no accumulation-order freedom.
  *
  * TWO-REGIME ([[run]] dispatch): under [[Betweenness.LocalEdgeLimit]]
  * the batch-CSR regime shared with [[Bfs]]/
  * [[graft.ppr.PowerIteration.batch]] — the weighted snapshot broadcasts
  * once, one task per source slice runs K synchronous relaxation rounds
  * over dense arrays (synchronous = relax from the PREVIOUS round's
  * array only, which is exactly the round-r min-plus semantics — the
  * asynchronous speedups of a single-machine Dijkstra would compute the
  * K-hop bound incorrectly). Past the envelope, [[runSupersteps]]: the
  * [[ConnectedComponents]]-style superstep loop with state
  * `(source, id, dist)` and one min-plus shuffle per round — no driver
  * collect anywhere. min over doubles is order-free, so both regimes
  * return bit-identical frames (SsspSpec pins it).
  */
object Sssp {

  /** Two-regime dispatch over an `(src, dst, w)` edge DataFrame;
    * `csrOf` and `edgeCount` as in [[Betweenness.run]]
    * (memoized-snapshot and snapshot-metadata hooks).
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      sources: Seq[Long],
      maxHops: Int,
      csrOf: DataFrame => WeightedCsr = buildWeighted,
      edgeCount: Option[Long] = None): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
    val m = edgeCount.getOrElse { e.persist(); e.count() }
    val out =
      if (m <= Betweenness.LocalEdgeLimit)
        batch(spark, csrOf(e), sources, maxHops)
      else runSupersteps(spark, e, sources, maxHops)
    if (edgeCount.isEmpty) e.unpersist()
    out
  }

  /** The past-one-machine regime: `maxHops` min-plus supersteps — per
    * round the improved-frontier relaxations (state rows whose dist
    * changed last round ⋈ edges → dist + w) union the carried state,
    * min per (source, id). Relaxing only from IMPROVED rows is the
    * classic Bellman-Ford frontier optimization and provably preserves
    * the round-r min-plus value: a relaxation from a row unimproved at
    * round r−1 was already applied the round after it last improved.
    */
  def runSupersteps(
      spark: SparkSession,
      edges: DataFrame,
      sources: Seq[Long],
      maxHops: Int): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    val held = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
    def ck(df: DataFrame): DataFrame = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      held += (sc.getPersistentRDDs.keySet -- before).toSet
      out
    }
    val e0 = edges.select(col("src"), col("dst"), col("w"))
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
      var state = ck(srcDf.select(col("source"), col("source").as("id"),
        lit(0.0).as("dist")))
      var improved = state
      var r = 1
      while (r <= maxHops) {
        val relax = e.join(sided(improved), e("src") === improved("id"))
          .select(improved("source").as("source"), e("dst").as("id"),
            (col("dist") + col("w")).as("dist"))
        val next = ck(state.unionAll(relax)
          .groupBy(col("source"), col("id"))
          .agg(min(col("dist")).as("dist")))
        improved = ck(next.join(state.select(col("source"), col("id"),
            col("dist").as("pd")), Seq("source", "id"), "left")
          .where(col("pd").isNull || col("dist") < col("pd"))
          .select(col("source"), col("id"), col("dist")))
        state = next
        r += 1
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

  /** Weighted CSR arrays: sorted node ids, offsets, dense targets, and
    * per-edge weights aligned with `targets`. Built sorted by
    * `(src, dst)` so the layout is deterministic.
    */
  final class WeightedCsr(
      val ids: Array[Long],
      val offsets: Array[Int],
      val targets: Array[Int],
      val weights: Array[Double]) extends Serializable {
    def numNodes: Int = ids.length
    def denseOf(id: Long): Int = {
      val i = java.util.Arrays.binarySearch(ids, id)
      if (i >= 0) i else -1
    }
  }

  /** Collect a `(src, dst, w)` edge DataFrame into a [[WeightedCsr]]
    * (driver-side; caller broadcasts — same contract as
    * [[GraphOps.buildCsr]]).
    */
  def buildWeighted(edges: DataFrame): WeightedCsr = {
    val rows = edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val idSet = new java.util.TreeSet[java.lang.Long]()
    rows.foreach { case (s, d, _) => idSet.add(s); idSet.add(d) }
    val ids = new Array[Long](idSet.size)
    var i = 0
    val it = idSet.iterator()
    while (it.hasNext) { ids(i) = it.next(); i += 1 }
    val n = ids.length
    val deg = new Array[Int](n)
    rows.foreach { case (s, _, _) =>
      deg(java.util.Arrays.binarySearch(ids, s)) += 1
    }
    val offsets = new Array[Int](n + 1)
    i = 0
    while (i < n) { offsets(i + 1) = offsets(i) + deg(i); i += 1 }
    val targets = new Array[Int](rows.length)
    val weights = new Array[Double](rows.length)
    val cursor = offsets.clone()
    rows.foreach { case (s, d, w) =>
      val sd = java.util.Arrays.binarySearch(ids, s)
      targets(cursor(sd)) = java.util.Arrays.binarySearch(ids, d).toInt
      weights(cursor(sd)) = w
      cursor(sd) += 1
    }
    new WeightedCsr(ids, offsets, targets, weights)
  }

  /** One bounded-hop relaxation per source over the broadcast weighted
    * CSR; rows only for nodes reachable within `maxHops` edges.
    */
  def batch(
      spark: SparkSession,
      g: WeightedCsr,
      sources: Seq[Long],
      maxHops: Int): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(g)
    val nSlices = math.min(math.max(1, sources.length),
      spark.sparkContext.defaultParallelism)
    spark.sparkContext
      .parallelize(sources, nSlices)
      .flatMap { s =>
        val w = bc.value
        val sd = w.denseOf(s)
        if (sd < 0) Iterator.empty
        else {
          val n = w.numNodes
          var prev = Array.fill(n)(Double.PositiveInfinity)
          prev(sd) = 0.0
          var r = 0
          while (r < maxHops) {
            val next = prev.clone()
            var u = 0
            while (u < n) {
              val du = prev(u)
              if (du != Double.PositiveInfinity) {
                var p = w.offsets(u)
                val end = w.offsets(u + 1)
                while (p < end) {
                  val cand = du + w.weights(p)
                  val v = w.targets(p)
                  if (cand < next(v)) next(v) = cand
                  p += 1
                }
              }
              u += 1
            }
            prev = next
            r += 1
          }
          (0 until n).iterator.collect {
            case v if prev(v) != Double.PositiveInfinity =>
              (s, w.ids(v), prev(v))
          }
        }
      }
      .toDF("source", "node_id", "dist")
  }

  /** DuckDB oracle: `maxHops` unrolled min-plus rounds. `edgeSql` must
    * yield `(src, dst, w)`.
    */
  def oracleSql(edgeSql: String, sources: Seq[Long], maxHops: Int): String = {
    val values = sources.map(s => s"($s)").mkString(", ")
    val sb = new StringBuilder
    sb ++= s"WITH e AS MATERIALIZED ($edgeSql),\n"
    sb ++= "nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),\n"
    sb ++= "d0 AS MATERIALIZED (SELECT CAST(s AS BIGINT) AS src, " +
      "CAST(s AS BIGINT) AS id, CAST(0 AS DOUBLE) AS dist " +
      s"FROM (VALUES $values) v(s) WHERE s IN (SELECT id FROM nodes)),\n"
    for (i <- 1 to maxHops) {
      val prev = s"d${i - 1}"
      sb ++= s"d$i AS MATERIALIZED (SELECT src, id, min(dist) AS dist FROM (" +
        s"SELECT src, id, dist FROM $prev " +
        s"UNION ALL SELECT p.src, e.dst AS id, p.dist + e.w " +
        s"FROM $prev p JOIN e ON e.src = p.id) u GROUP BY src, id),\n"
    }
    sb.setLength(sb.length - 2)
    sb ++= s"\nSELECT src AS source, id AS node_id, dist FROM d$maxHops"
    sb.toString
  }
}
