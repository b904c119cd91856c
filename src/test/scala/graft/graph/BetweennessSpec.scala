package graft.graph

import graft.SparkSpec
import graft.queries.Graph

class BetweennessSpec extends SparkSpec {

  /** Independent truncated-betweenness brute force via the PAIR-
    * DEPENDENCY definition (not the level sweep the kernel runs):
    * bc(v) = Σ_s Σ_{t: 1 ≤ dist_s(t) ≤ D} σ_st(v)/σ_st, with σ_st(v) =
    * σ_s(v)·σ_v(t) over the shortest-path DAG. Different accumulation
    * ORDER than the kernel, so the compare is tolerance-based — the
    * bit-exactness carrier is the DuckDB oracle, this pins the MATH.
    */
  private def brute(edges: Seq[(Long, Long)], sources: Seq[Long],
      depth: Int): Map[Long, Double] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val bc = scala.collection.mutable.Map.empty[Long, Double]
      .withDefaultValue(0.0)
    for (s <- sources if nodes.contains(s)) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var frontier = Seq(s)
      var d = 0
      while (d < depth && frontier.nonEmpty) {
        val next = scala.collection.mutable.ArrayBuffer.empty[Long]
        frontier.foreach { v =>
          adj.getOrElse(v, Nil).foreach { w =>
            if (!dist.contains(w)) { dist(w) = d + 1; next += w }
            if (dist(w) == d + 1) sigma(w) = sigma.getOrElse(w, 0L) + sigma(v)
          }
        }
        frontier = next.distinct.toSeq
        d += 1
      }
      // per target t: backward σ_v(t) over the DAG, then fractions
      val byLevel = dist.toSeq.groupBy(_._2).view.mapValues(_.map(_._1))
      for (t <- dist.keys if dist(t) >= 1) {
        val back = scala.collection.mutable.Map(t -> 1L)
        for (l <- (dist(t) - 1) to 1 by -1; v <- byLevel.getOrElse(l, Nil)) {
          val c = adj.getOrElse(v, Nil)
            .filter(w => dist.get(w).contains(l + 1) && back.contains(w))
            .map(back).sum
          if (c > 0) back(v) = c
        }
        for ((v, c) <- back if v != t && v != s)
          bc(v) += sigma(v).toDouble * c.toDouble / sigma(t).toDouble
      }
    }
    bc.toMap
  }

  test("g_betweenness matches the pair-dependency brute force on the " +
      "bench graph within round-6 tolerance") {
    val got = Graph.queries("g_betweenness")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val edges = GraphOps.lineitemGraph(spark, sfDir, Graph.Mod).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = brute(edges, Graph.BatchSources, Graph.BfsDepth)
    // got covers every node reached by any source BFS (zero-bc leaves
    // included); brute only accumulates nonzero deltas
    want.foreach { case (v, b) =>
      assert(got.contains(v), s"node $v missing")
      assert(math.abs(got(v) - b) <= 2e-6, s"node $v: ${got(v)} vs $b")
    }
    (got.keySet -- want.keySet).foreach(v => assert(got(v) == 0.0))
    assert(want.values.count(_ > 0) > 10, "fixture must exercise bc > 0")
  }

  test("batch CSR and superstep regimes are EXACTLY equal on the bench " +
      "graph (hash-identity, not tolerance — the two-regime contract)") {
    val edges = GraphOps.lineitemGraph(spark, sfDir, Graph.Mod)
    val batch = Betweenness
      .batch(spark, GraphOps.buildCsr(edges), Graph.BatchSources,
        Graph.BfsDepth)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sup = Betweenness
      .runSupersteps(spark, edges, Graph.BatchSources, Graph.BfsDepth)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // exact double equality: sigma sums are order-free integers and every
    // float fold is value-sorted, so the regimes cannot differ by an ulp
    assert(sup == batch)
    assert(batch.values.count(_ > 0) > 10)
  }

  test("superstep regime on the diamond handles absent sources, " +
      "duplicate sources, and an early-emptied frontier") {
    import spark.implicits._
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    // depth larger than the graph's depth: frontier empties early
    val got = Betweenness.runSupersteps(spark, e, Seq(0L, 0L, 42L), 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // full (untruncated) Brandes from 0: δ(3) = σ₃/σ₄·(1+δ₄) = 2/2·1 = 1
    // (the ratio normalizes over both branches), δ(1) = δ(2) =
    // 1/2·(1+δ₃) = 1, δ(4) = 0 (leaf); duplicate source 0 must NOT
    // double anything, absent 42 adds nothing.
    assert(got == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0, 4L -> 0.0))
  }

  test("diamond + tail closed form: both branch nodes carry the full " +
      "path fraction and the horizon node reads zero") {
    import spark.implicits._
    // s(0) -> a(1), b(2); a,b -> t(3); t -> u(4); source {0}, depth 3
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val csr = GraphOps.buildCsr(e.toDF("src", "dst"))
    val got = Betweenness.batch(spark, csr, Seq(0L), 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // δ(t) = σt/σu·(1+0) = 1; δ(a) = σa/σt·(1+δt) = 0.5·2 = 1 = δ(b)
    assert(got == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0, 4L -> 0.0))
  }
}
