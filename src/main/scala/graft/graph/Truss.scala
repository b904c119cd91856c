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

  /** Support DELTAS from a batch removal: every triangle of the
    * PREVIOUS graph (`und ∪ removed`) that contains ≥ 1 removed edge
    * costs each of its SURVIVING edges exactly one support — including
    * triangles that lost two or three edges at once, which is why the
    * enumeration dedupes on the canonical sorted triple BEFORE the
    * 3-edge fan-out (a per-removed-edge decrement would double-count
    * them). Triangles are found by scanning each removed edge's
    * lower-(degree, id) endpoint's adjacency (the orientation
    * discipline of [[support]], applied to the removal set): cost is
    * Σ min-degree over REMOVED edges — the incremental-regime economics
    * — never a pass over the survivors. Returns `(a, b, dcnt)` for the
    * touched surviving edges.
    */
  private def removalDeltas(und: DataFrame, removed: DataFrame)
      : DataFrame = {
    val prev = und.unionAll(removed)
    // NOT checkpointed: both parents are, and the union is a narrow map
    // — re-deriving it three times (degrees, wedge scan, closure
    // semi-join) is cheaper than a third checkpoint job at the tail,
    // where the round cost is job floor, not compute
    val prevAdj = prev.select(col("a").as("u"), col("b").as("v"))
      .unionAll(prev.select(col("b").as("u"), col("a").as("v")))
    val deg = prevAdj.groupBy("u").agg(count(lit(1)).as("dg"))
    val rOri = removed
      .join(deg.select(col("u").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("u").as("b"), col("dg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("p"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("q"))
    val tri = rOri.join(prevAdj, col("p") === col("u"))
      .select(col("p"), col("q"), col("v").as("c"))
      .where(col("c") =!= col("q"))
      .join(prevAdj.select(col("u").as("q"), col("v").as("c")),
        Seq("q", "c"), "left_semi")
    val trio = tri.select(
        least(col("p"), col("q"), col("c")).as("t1"),
        (col("p") + col("q") + col("c")
          - least(col("p"), col("q"), col("c"))
          - greatest(col("p"), col("q"), col("c"))).as("t2"),
        greatest(col("p"), col("q"), col("c")).as("t3"))
      .distinct()
      .localCheckpoint(true) // fans out to three edge streams
    trio.select(col("t1").as("a"), col("t2").as("b"))
      .unionAll(trio.select(col("t1").as("a"), col("t3").as("b")))
      .unionAll(trio.select(col("t2").as("a"), col("t3").as("b")))
      .join(und, Seq("a", "b"), "left_semi") // only SURVIVING edges decrement
      .groupBy("a", "b").agg(count(lit(1)).as("dcnt"))
  }

  /** Below this many surviving edges the incremental path's extra
    * per-round jobs (degree/wedge/closure chain + checkpoint in
    * [[removalDeltas]]) cost more than recomputing the whole survivor
    * set — at small n the regime boundary is the JOB FLOOR, not compute
    * (measured: the 352-edge GOT rows ran 55–75 % slower incremental,
    * while the 11.9M-edge octave improved 137.7 → 80.8 s). The dispatch
    * therefore also requires the survivor count to clear this absolute
    * floor before engaging the incremental regime.
    */
  val IncrFloorEdges = 100000L

  /** In-memory fixed-horizon peel — the sub-floor REGIME of [[run]]
    * (the `ConnectedComponents.runLocal` two-regime discipline): below
    * [[IncrFloorEdges]] survivors every distributed round costs pure job
    * floor (r17 measured the 352-edge GOT rows at 4.6–5.5 s/row against
    * ~0.3 s of actual compute), so the driver peels the collected edge
    * set directly. Identical output by construction: support counts are
    * exact integers (adjacency-set intersections), the horizon/early-exit
    * schedule is the same statement [[run]]'s loop executes, and the
    * horizon-exhausted branch reports support over the final survivor
    * set unfiltered — TrussSpec pins local ≡ distributed on a fixture
    * that converges AND one that exhausts the horizon.
    */
  private[graft] def runLocalPeel(
      edges0: Array[(Long, Long)], k: Int, rounds: Int,
      onRound: (Int, Long) => Unit = (_, _) => (),
      onRegime: (Int, String) => Unit = (_, _) => ())
      : Array[(Long, Long, Long)] = {
    def support(es: Array[(Long, Long)])
        : scala.collection.mutable.HashMap[(Long, Long), Long] = {
      val nbr = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.HashSet[Long]]
      es.foreach { case (a, b) =>
        nbr.getOrElseUpdate(a, scala.collection.mutable.HashSet.empty) += b
        nbr.getOrElseUpdate(b, scala.collection.mutable.HashSet.empty) += a
      }
      val out = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
      es.foreach { case (a, b) =>
        val (sm, bg) =
          if (nbr(a).size <= nbr(b).size) (nbr(a), nbr(b))
          else (nbr(b), nbr(a))
        var c = 0L
        sm.foreach(w => if (w != a && w != b && bg.contains(w)) c += 1L)
        if (c > 0L) out((a, b)) = c
      }
      out
    }
    var cur = edges0
    var m = cur.length.toLong
    var lastSup: Array[(Long, Long, Long)] = null
    var converged = false
    var r = 0
    while (r < rounds && !converged) {
      onRegime(r + 1, "local")
      val sup = support(cur)
      val surv = cur.flatMap { e =>
        val s = sup.getOrElse(e, 0L)
        if (s >= k - 2) Some((e._1, e._2, s)) else None
      }
      val m2 = surv.length.toLong
      onRound(r + 1, m2)
      cur = surv.map(t => (t._1, t._2))
      converged = m2 == m
      m = m2
      lastSup = surv
      r += 1
    }
    if (converged) lastSup
    else {
      val sup = support(cur)
      cur.flatMap { e =>
        sup.get(e).map(s => (e._1, e._2, s)) // sup-0 edges emit no row
      }
    }
  }

  /** Fixed-horizon k-truss over an `(a, b)` a<b distinct edge set.
    * Returns `(a, b, sup)` — the surviving edges with support computed
    * over the final survivor set (at a reached fixpoint, every reported
    * sup ≥ k−2 by construction).
    *
    * Per round the support either comes from the full wedge pipeline
    * ([[support]]) or — when the previous round removed few edges
    * relative to the survivors (2·|R| ≤ |S|) AND the survivor set is
    * large enough that per-round work beats the job floor
    * (|S| ≥ `incrFloor`, default [[IncrFloorEdges]]) — from the
    * INCREMENTAL decrement path ([[removalDeltas]]): only edges that
    * lost a triangle can change, so the new support is the carried
    * table minus the removal deltas, and the cost is proportional to
    * the removal set, not the surviving graph. That retires the tail
    * economics the full recompute had (the octave K=4 cascade spends
    * 19 rounds shrinking 795k → 95,456 edges by ever-smaller removals —
    * the ≥ 10⁵-survivor rounds touch only the removed edges' wedges,
    * and the sub-floor tail recomputes its small survivor set, which is
    * cheaper than the delta chain's extra jobs there).
    * Regime choice is a pure optimization: both paths compute support
    * over the identical survivor set (TrussSpec pins hybrid ≡
    * full-recompute on a multi-round cascade with BOTH regimes engaged,
    * plus the default floor keeping a small graph all-full; `onRegime`
    * discloses the per-round choice).
    */
  def run(spark: SparkSession, und0: DataFrame, k: Int, rounds: Int,
      onRound: (Int, Long) => Unit = (_, _) => (),
      onRegime: (Int, String) => Unit = (_, _) => (),
      incrFloor: Long = IncrFloorEdges): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    var und = und0.localCheckpoint(true)
    var m = und.count()
    // sub-floor regime: below `incrFloor` edges every distributed round
    // is job floor, so peel the collected set driver-side instead
    // ([[runLocalPeel]]; output identical, spec-pinned). Long ids only —
    // an exotic schema keeps the general path.
    if (m < incrFloor && Seq("a", "b").forall(c =>
        und.schema.fields.exists(f => f.name == c &&
          f.dataType == org.apache.spark.sql.types.LongType))) {
      import spark.implicits._
      // bind (a, b) BY NAME, exactly like the distributed path's
      // col("a")/col("b") — a frame carrying extra leading columns must
      // not silently peel the wrong pair.
      val es = und.select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      return runLocalPeel(es, k, rounds, onRound, onRegime)
        .toSeq.toDF("a", "b", "sup")
    }
    var lastSup: DataFrame = null // survivors (a, b, sup), current graph
    var removed: DataFrame = null // edges dropped by the previous round
    var remCount = 0L
    var converged = false
    var r = 0
    while (r < rounds && !converged) {
      val incr = removed != null && 2 * remCount <= m && m >= incrFloor
      onRegime(r + 1, if (incr) "incr" else "full")
      val supAll =
        if (!incr) support(und) // 0-support edges absent ⟹ dropped below
        else lastSup.join(removalDeltas(und, removed), Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            (col("sup") - coalesce(col("dcnt"), lit(0L))).as("sup"))
      val surv = supAll.where(col("sup") >= k - 2).localCheckpoint(true)
      val m2 = surv.count()
      onRound(r + 1, m2)
      // removed-set bookkeeping feeds ONLY the incremental path, so when
      // the floor already disqualifies the next round (m2 < incrFloor)
      // skip its checkpoint job entirely — a sub-floor run is then
      // job-for-job identical to runFull (the GOT-scale economics).
      removed =
        if (m2 < incrFloor) null
        else (if (incr) supAll.where(col("sup") < k - 2)
            .select(col("a"), col("b"))
          else und.join(surv.select(col("a"), col("b")),
            Seq("a", "b"), "left_anti"))
          .localCheckpoint(true)
      remCount = m - m2
      und = surv.select(col("a"), col("b"))
      // monotone peel: unchanged count ⟹ unchanged set ⟹ fixpoint, and
      // sup (computed over the identical previous set) IS the answer.
      converged = m2 == m
      m = m2
      lastSup = surv
      r += 1
    }
    if (converged) lastSup
    else support(und) // horizon exhausted pre-fixpoint: support over e_R
  }

  /** The round-15 full-recompute loop, kept verbatim as the regression
    * reference: TrussSpec pins [[run]]'s hybrid schedule against it.
    */
  private[graft] def runFull(spark: SparkSession, und0: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    var und = und0.localCheckpoint(true)
    var m = und.count()
    var lastSup: DataFrame = null
    var converged = false
    var r = 0
    while (r < rounds && !converged) {
      val sup = support(und).where(col("sup") >= k - 2)
        .localCheckpoint(true)
      val m2 = sup.count()
      und = sup.select(col("a"), col("b"))
      converged = m2 == m
      m = m2
      lastSup = sup
      r += 1
    }
    if (converged) lastSup
    else support(und)
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
