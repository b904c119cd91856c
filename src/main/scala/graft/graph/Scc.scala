package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ppr.PowerIteration

/** Distributed strongly connected components of the DIRECTED edge list —
  * the missing classic next to [[ConnectedComponents]] (which labels the
  * symmetrized graph). Output `(node_id LONG, comp LONG)` with `comp` =
  * the smallest node id of the SCC — the same canonical labeling from
  * both execution regimes.
  *
  * Two-regime dispatch, the [[ConnectedComponents.run]] philosophy:
  *
  *  - under [[LocalEdgeLimit]]: one scan + iterative (explicit-stack)
  *    Tarjan over a dense CSR of the collected edges — linear time,
  *    exact, no schedule to converge;
  *  - above it: the Orzan coloring algorithm (Orzan 2004; the standard
  *    BSP/Pregel SCC — e.g. Yan et al., VLDB'14), per outer round:
  *      1. TRIM: nodes with no in- or no out-edge inside the active
  *         subgraph are singleton SCCs — peeled without any propagation
  *         (kills the DAG tails that would otherwise cost a round each);
  *      2. COLOR forward: c(v) = max(v, max over u→v of c(u)) to
  *         fixpoint — c(v) = the largest active id that reaches v;
  *      3. CONTAIN backward: from each root (c(v) = v), grow {v : v→…→
  *         root and c(v) = root} along reversed edges — exactly
  *         SCC(root), peeled and labeled.
  *    Both inner loops run a FIXED superstep budget and then verify
  *    convergence with one extra step (`require` — loud failure rather
  *    than a silently wrong labeling; the aaCap discipline). State is
  *    node-rows only; the active edge set is re-restricted per round by
  *    two semi-joins and every superstep is one map-side-combined
  *    aggregate over the (dst, color) contribution stream.
  */
object Scc {

  /** Same budget rationale as [[ConnectedComponents.LocalEdgeLimit]]. */
  val LocalEdgeLimit = 8000000L

  /** Per-outer-round telemetry hook for [[runSupersteps]]:
    * (round, trimmed singleton count, contain-peeled count) — the octave
    * harness discloses trim sizes through it. The default no-op skips
    * the two count jobs entirely.
    */
  type RoundStats = (Int, Long, Long) => Unit
  val NoStats: RoundStats = (_, _, _) => ()

  def run(spark: SparkSession, edges: DataFrame, fwdSteps: Int,
      outerRounds: Int, onRound: RoundStats = NoStats): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val m = e.count()
    val out =
      if (m <= LocalEdgeLimit) runLocal(spark, e)
      else runSupersteps(spark, e, fwdSteps, outerRounds, onRound)
    e.unpersist()
    out
  }

  /** Iterative Tarjan over a dense CSR of the collected edge list — the
    * fits-on-one-machine regime. Explicit stacks (no recursion: corpus
    * SCC chains would blow the JVM stack), components labeled by their
    * minimum member.
    */
  private[graph] def runLocal(spark: SparkSession,
      edges: DataFrame): DataFrame = {
    import spark.implicits._
    val pairs = edges.select(col("src"), col("dst")).as[(Long, Long)]
      .collect()
    val ids = {
      val all = new Array[Long](pairs.length * 2)
      var i = 0
      while (i < pairs.length) {
        all(2 * i) = pairs(i)._1; all(2 * i + 1) = pairs(i)._2; i += 1
      }
      java.util.Arrays.sort(all)
      var n = 0
      var j = 0
      while (j < all.length) {
        if (n == 0 || all(j) != all(n - 1)) { all(n) = all(j); n += 1 }
        j += 1
      }
      java.util.Arrays.copyOf(all, n)
    }
    val n = ids.length
    // dense CSR
    val outDeg = new Array[Int](n)
    pairs.foreach { case (s, _) =>
      outDeg(java.util.Arrays.binarySearch(ids, s)) += 1
    }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + outDeg(i); i += 1 }
    val nbr = new Array[Int](pairs.length)
    val fill = off.clone()
    pairs.foreach { case (s, d) =>
      val si = java.util.Arrays.binarySearch(ids, s)
      nbr(fill(si)) = java.util.Arrays.binarySearch(ids, d)
      fill(si) += 1
    }
    // iterative Tarjan
    val index = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val onStack = new Array[Boolean](n)
    val stack = new java.util.ArrayDeque[Integer]
    val comp = Array.fill(n)(-1)
    var counter = 0
    val callV = new Array[Int](n + 1) // explicit call stack: vertex
    val callE = new Array[Int](n + 1) // ... and next-edge cursor
    var v0 = 0
    while (v0 < n) {
      if (index(v0) == -1) {
        var top = 0
        callV(0) = v0; callE(0) = off(v0)
        index(v0) = counter; low(v0) = counter; counter += 1
        stack.push(v0); onStack(v0) = true
        while (top >= 0) {
          val v = callV(top)
          if (callE(top) < off(v + 1)) {
            val w = nbr(callE(top)); callE(top) += 1
            if (index(w) == -1) {
              index(w) = counter; low(w) = counter; counter += 1
              stack.push(w); onStack(w) = true
              top += 1; callV(top) = w; callE(top) = off(w)
            } else if (onStack(w) && index(w) < low(v)) low(v) = index(w)
          } else {
            if (low(v) == index(v)) {
              // pop the SCC; label by its minimum node id
              var minId = Long.MaxValue
              val members = new scala.collection.mutable.ArrayBuffer[Int]
              var w = -1
              while (w != v) {
                w = stack.pop(); onStack(w) = false
                members += w
                if (ids(w) < minId) minId = ids(w)
              }
              val lbl = java.util.Arrays.binarySearch(ids, minId)
              members.foreach(m => comp(m) = lbl)
            }
            top -= 1
            if (top >= 0) {
              val p = callV(top)
              if (low(v) < low(p)) low(p) = low(v)
            }
          }
        }
      }
      v0 += 1
    }
    val rows = Array.tabulate(n)(v => (ids(v), ids(comp(v))))
    spark.createDataset(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(rows))
      .toDF("node_id", "comp")
  }

  /** The coloring loop — the past-one-machine regime. Deterministic
    * given the budgets; `require`-fails on non-convergence instead of
    * returning a wrong labeling.
    */
  private[graph] def runSupersteps(spark: SparkSession, edges: DataFrame,
      fwdSteps: Int, outerRounds: Int,
      onRound: RoundStats = NoStats): DataFrame = {
    val sc = spark.sparkContext
    // one CkptChain PER state variable — colr must survive the whole
    // containment loop, so it cannot share a chain with reach
    val activeCk = new graft.operators.CkptChain(sc)
    val aeCk = new graft.operators.CkptChain(sc)
    def ck(df: DataFrame): DataFrame = df.localCheckpoint(true)

    val e0 = ck(edges.select(col("src"), col("dst")).distinct())
    var active = activeCk(e0.select(col("src").as("id"))
      .unionAll(e0.select(col("dst").as("id"))).distinct())
    val small = active.count() <= PowerIteration.BroadcastNodeLimit
    def sided(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    def restrict(es: DataFrame, act: DataFrame): DataFrame = es
      .join(sided(act.select(col("id").as("src"))), Seq("src"), "left_semi")
      .join(sided(act.select(col("id").as("dst"))), Seq("dst"), "left_semi")

    // peeled results stay pinned until the final union reads them —
    // bounded by outerRounds frames of strictly shrinking node sets
    val done = new scala.collection.mutable.ArrayBuffer[DataFrame]
    var round = 0
    while (round < outerRounds && active.head(1).nonEmpty) {
      var ae = aeCk(restrict(e0, active))
      // 1. TRIM singleton SCCs (no in- or no out-edge in the active set)
      val hasOut = ae.select(col("src").as("id")).distinct()
      val hasIn = ae.select(col("dst").as("id")).distinct()
      val trimmed = ck(active
        .join(hasOut.intersect(hasIn), Seq("id"), "left_anti"))
      done += trimmed.select(col("id").as("node_id"), col("id").as("root"))
      active = activeCk(active.join(trimmed, Seq("id"), "left_anti"))
      var peeledCount = 0L
      if (active.head(1).nonEmpty) {
        ae = aeCk(restrict(ae, active))
        // 2. COLOR forward to fixpoint — neighbor-max as aggregate +
        // left join + greatest, NOT the union-carrier shape (a union
        // whose children both derive from the state trips Union
        // constraint rewriting in analysis; same workaround as
        // [[ConnectedComponents.runSupersteps]]).
        def colorStep(c: DataFrame): DataFrame = {
          val nm = ae
            .join(sided(c.select(col("id").as("src"), col("c").as("nc"))),
              Seq("src"))
            .groupBy(col("dst").as("nid")).agg(max(col("nc")).as("nc"))
          c.join(sided(nm), c("id") === nm("nid"), "left")
            .select(c("id").as("id"),
              greatest(col("c"), coalesce(col("nc"), col("c"))).as("c"))
        }
        val colorCk = new graft.operators.CkptChain(sc, resetStats = true)
        var colr = colorCk(active.select(col("id"), col("id").as("c")))
        for (_ <- 1 to fwdSteps) colr = colorCk(colorStep(colr))
        val colorDelta = colorStep(colr).as("n")
          .join(colr.as("o"), col("n.id") === col("o.id"))
          .where(col("n.c") =!= col("o.c")).count()
        require(colorDelta == 0L,
          s"g_scc: color propagation not converged after $fwdSteps " +
            s"supersteps ($colorDelta nodes still changing) — raise the budget")
        // 3. CONTAIN backward from the roots. State (id, c, r): r = the
        // root this node is contained in (null while unresolved). A
        // node joins when some out-neighbor carries a root equal to the
        // node's own color — join + coalesce, again no union.
        def containStep(st: DataFrame): DataFrame = {
          val contrib = ae
            .join(sided(st.select(col("id").as("dst"), col("r").as("ur"))),
              Seq("dst"))
            .where(col("ur").isNotNull)
            .select(col("src").as("id"), col("ur"))
          val filt = contrib
            .join(sided(st.select(col("id"), col("c"))), Seq("id"))
            .where(col("ur") === col("c"))
            .groupBy("id").agg(max(col("ur")).as("nr"))
          st.join(sided(filt), st("id") === filt("id"), "left")
            .select(st("id").as("id"), st("c").as("c"),
              coalesce(st("r"), col("nr")).as("r"))
        }
        val reachCk = new graft.operators.CkptChain(sc, resetStats = true)
        var rst = reachCk(colr.select(col("id"), col("c"),
          when(col("c") === col("id"), col("id")).as("r")))
        for (_ <- 1 to fwdSteps) rst = reachCk(containStep(rst))
        val reachDelta = containStep(rst).where(col("r").isNotNull).count() -
          rst.where(col("r").isNotNull).count()
        require(reachDelta == 0L,
          s"g_scc: backward containment not converged after $fwdSteps " +
            s"supersteps ($reachDelta nodes still joining) — raise the budget")
        // pin the peel OUTSIDE the reach chain, then retire both loops'
        // working state
        val peeled = ck(rst.where(col("r").isNotNull)
          .select(col("id"), col("r").as("root")))
        done += peeled.select(col("id").as("node_id"), col("root"))
        active = activeCk(active.join(peeled, Seq("id"), "left_anti"))
        if (onRound ne NoStats) peeledCount = peeled.count()
        reachCk.releaseAll()
        colorCk.releaseAll()
      }
      round += 1
      if (onRound ne NoStats) onRound(round, trimmed.count(), peeledCount)
    }
    val leftover = active.count()
    require(leftover == 0L,
      s"g_scc: $leftover nodes unresolved after $outerRounds outer " +
        "rounds — raise the budget")
    // canonical labeling: comp = min node id of the SCC
    val res = ck(done.reduce(_ unionAll _))
    val canon = res.groupBy(col("root")).agg(min(col("node_id")).as("comp"))
    res.join(canon, Seq("root")).select(col("node_id"), col("comp"))
  }
}
