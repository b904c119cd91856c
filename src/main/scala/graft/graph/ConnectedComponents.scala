package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ppr.PowerIteration

/** Distributed connected components — the per-node component labeling every
  * corpus-scale dedup pipeline ends with (duplicate-pair edges → duplicate
  * CLUSTERS; see `d_dup_clusters` for the in-query twin on LSH pairs). The
  * reference engine has no CC kernel, but its whole-graph snapshot model
  * (SURVEY §1.4.5 — undirected = both directed arcs) fixes the semantics:
  * components of the symmetrized edge set.
  *
  * Algorithm: label propagation with POINTER JUMPING, a fixed round count.
  * Each round r:
  *
  *   a(v) = min( lab(v), min_{u~v} lab(u) )     — neighbor-min, 1 shuffle
  *   lab'(v) = a(a(v))                          — pointer jump, 1 join
  *
  * Plain neighbor-min needs diameter rounds (36 on the sf0.01 benchmark
  * subgraph); the jump step contracts label chains toward their minimum,
  * cutting that to ≤18 across the test scales — the hash-to-min idea of
  * Rastogi et al. (ICDE'13) / the star-contraction family (Kiveris et al.,
  * SoCC'14). Labels only decrease, and a label is always an existing node
  * id (the min over some subset of the component), so the jump join always
  * matches and the fixpoint is the component minimum.
  *
  * Scale shape (the 100 TB contract):
  *  - the symmetrized adjacency is built once, hash-partitioned by `src`,
  *    and reused every round — the neighbor-min then shuffles ONLY the
  *    (dst, lab) contribution stream plus the n-row carrier, never the
  *    edge list again;
  *  - the state is n rows (node, label): broadcast below
  *    [[PowerIteration.BroadcastNodeLimit]] (shuffle-free probes), a
  *    co-partitioned shuffle join above it;
  *  - per-round state snapshots chain through [[graft.operators.CkptChain]]
  *    — generation N-1 is released as N lands, so a long run pins O(n),
  *    not O(rounds·n);
  *  - the round count is FIXED (deterministic schedule → the DuckDB
  *    oracle replays it exactly as unrolled CTEs); production would stop
  *    on an empty-delta check — one extra 1-row aggregate per round.
  */
object ConnectedComponents {

  /** Edge-count ceiling for the single-task union-find path of [[run]]:
    * the collect lands in specialized `(Long, Long)` tuples (~48
    * bytes/edge with array + tuple headers) and the find structure is a
    * primitive dense-int array over the sorted id universe — ~400 MB
    * transient driver footprint at the ceiling, then linear-time work.
    * Same two-regime philosophy as [[graft.ppr.PowerIteration]]'s
    * batch-CSR sibling: when the graph fits one machine, a scan +
    * union-find beats rounds of scheduled jobs by 10×; past the ceiling
    * the superstep loop is the only shape that scales, and it takes over
    * automatically.
    */
  val LocalEdgeLimit = 8000000L

  /** Connected components of the symmetrized `(src, dst)` edge list.
    * Returns `(node_id LONG, comp LONG)` — `comp` is the smallest node id
    * in the component. Dispatches on graph size: union-find over a
    * collected edge list below [[LocalEdgeLimit]], the
    * [[runSupersteps]] loop above it. Both return the same labeling
    * whenever `rounds` supersteps converge (ConnectedComponentsSpec
    * asserts both the agreement and the convergence at the shipped
    * round count).
    */
  def run(spark: SparkSession, edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    val m = e.count()
    val out = runPreCounted(spark, e, rounds, m)
    e.unpersist()
    out
  }

  /** [[run]]'s two-regime dispatch for callers that already know the
    * edge count (the MSF round loop counts its pick table anyway) —
    * skips the persist + count jobs, everything else identical.
    */
  def runPreCounted(spark: SparkSession, edges: DataFrame, rounds: Int,
      m: Long): DataFrame =
    if (m <= LocalEdgeLimit) runLocal(spark, edges)
    else runSupersteps(spark, edges, rounds)

  /** Single-pass union-find over the collected edge list — the
    * fits-on-one-machine regime. One scan job; linear work; exact
    * component minima (no fixed schedule to converge).
    */
  private def runLocal(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    // primitive collect (specialized Tuple2[Long, Long] — no boxed Rows)
    // and a dense-int union-find over the sorted id universe: no boxed
    // HashMap, footprint matches the [[LocalEdgeLimit]] budget.
    val pairs = edges.select(col("src"), col("dst")).as[(Long, Long)].collect()
    val ids = {
      val all = new Array[Long](pairs.length * 2)
      var i = 0
      while (i < pairs.length) {
        all(2 * i) = pairs(i)._1; all(2 * i + 1) = pairs(i)._2; i += 1
      }
      java.util.Arrays.sort(all)
      // unique in place
      var n = 0
      var j = 0
      while (j < all.length) {
        if (n == 0 || all(j) != all(n - 1)) { all(n) = all(j); n += 1 }
        j += 1
      }
      java.util.Arrays.copyOf(all, n)
    }
    val parent = Array.tabulate(ids.length)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { // path-halving
        parent(x) = parent(parent(x)); x = parent(x)
      }
      x
    }
    var i = 0
    while (i < pairs.length) {
      val ra = find(java.util.Arrays.binarySearch(ids, pairs(i)._1))
      val rb = find(java.util.Arrays.binarySearch(ids, pairs(i)._2))
      // dense ids are id-ordered, so pointing the larger root at the
      // smaller keeps every root the minimum node id of its class
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
      i += 1
    }
    val labels = Array.tabulate(ids.length)(v => (ids(v), ids(find(v))))
    spark.createDataset(scala.collection.immutable.ArraySeq.unsafeWrapArray(labels))
      .toDF("node_id", "comp")
  }

  /** `rounds` jump-accelerated label-propagation supersteps — the
    * past-one-machine regime. Deterministic fixed schedule (what
    * [[oracleSql]] replays).
    */
  def runSupersteps(spark: SparkSession, edges: DataFrame, rounds: Int): DataFrame = {
    val sc = spark.sparkContext
    def trackedCkpt(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def release(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))

    val adj0 = GraphOps.symmetrize(edges)
    val m = adj0.count()
    // scoped shuffle width + small-path interpreted mode: same rationale
    // as [[PageRank.run]] — rounds × near-empty reducers is scheduler
    // overhead on a small graph, and fresh expression ids per round would
    // pay a Janino compile for a few thousand rows.
    val p = math.min(sc.defaultParallelism.toLong, m / 1000000L + 1L).toInt
    val (adj, adjIds) = trackedCkpt(adj0.repartition(p, col("src")))
    val n = adj.select(col("src")).distinct().count()

    val checkpoint = new graft.operators.CkptChain(sc, resetStats = true)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevCodegen = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      if (p == 1) spark.conf.set("spark.sql.codegen.wholeStage", "false")
      // State sides broadcast below [[PowerIteration.BroadcastNodeLimit]]:
      // the n-row state moves, the m-row adjacency never reshuffles.
      val small = n <= PowerIteration.BroadcastNodeLimit
      def sided(df: DataFrame): DataFrame = if (small) broadcast(df) else df

      var state = checkpoint(
        adj.select(col("src").as("id")).distinct()
          .select(col("id"), col("id").as("lab")))
      var r = 0
      while (r < rounds) {
        // neighbor-min as aggregate + left join (not the union-carrier
        // shape: a union whose children BOTH derive from the state trips
        // Union constraint rewriting in analysis). Integer min is
        // shape-independent — least(own, min-of-neighbors) is bit-equal
        // to min over the union, which is what the oracle replays.
        val nm = adj.join(sided(state), adj("src") === state("id"))
          .select(adj("dst").as("nid"), col("lab").as("nlab"))
          .groupBy("nid").agg(min(col("nlab")).as("nlab"))
        val a = checkpoint(
          state.join(nm, state("id") === nm("nid"), "left")
            .select(state("id").as("id"),
              least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab")))
        // pointer jump: lab'(v) = a(a(v)). Labels are node ids, so the
        // self-join always matches.
        val t = a.as("t")
        val j = a.as("j")
        state = checkpoint(
          t.join(sided(j), col("t.lab") === col("j.id"))
            .select(col("t.id").as("id"), col("j.lab").as("lab")))
        r += 1
      }
      state.select(col("id").as("node_id"), col("lab").as("comp"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.codegen.wholeStage", prevCodegen)
      release(adjIds)
    }
  }

  /** DuckDB oracle: the identical fixed schedule as unrolled CTEs.
    * `graphSql` must yield `(src, dst)`; output `(node_id, comp)`.
    */
  def oracleSql(graphSql: String, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"WITH edges AS MATERIALIZED ($graphSql),\n"
    sb ++= "adj AS MATERIALIZED (SELECT src, dst FROM edges " +
      "UNION SELECT dst AS src, src AS dst FROM edges),\n"
    sb ++= "l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lab FROM adj),\n"
    for (i <- 1 to rounds) {
      val prev = s"l${i - 1}"
      sb ++= s"a$i AS MATERIALIZED (SELECT id, min(lab) AS lab FROM (" +
        s"SELECT a.dst AS id, t.lab FROM adj a JOIN $prev t ON a.src = t.id " +
        s"UNION ALL SELECT id, lab FROM $prev) u GROUP BY id),\n"
      sb ++= s"l$i AS MATERIALIZED (SELECT t.id, j.lab " +
        s"FROM a$i t JOIN a$i j ON t.lab = j.id),\n"
    }
    sb.setLength(sb.length - 2)
    sb ++= s"\nSELECT id AS node_id, lab AS comp FROM l$rounds"
    sb.toString
  }
}
