package graft.queries

import graft.SparkSpec
import graft.graph.GraphOps

class LinkPredSpec extends SparkSpec {

  private def brute(und: Seq[(Long, Long)], cap: Int, topN: Int)
      : Seq[(Long, Long, Long, Long, Long, Double)] = {
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val edges = und.toSet
    val cn = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for ((w, ns) <- adj; if deg(w) <= cap;
         u <- ns; v <- ns; if u < v) cn((u, v)) += 1
    cn.toSeq.collect { case ((u, v), c) if !edges.contains((u, v)) =>
      val (du, dv) = (deg(u), deg(v))
      (u, v, c, du, dv, c.toDouble / (du + dv - c).toDouble)
    }.sortBy { case (u, v, c, _, _, _) => (-c, u, v) }.take(topN)
  }

  test("g_linkpred_cn matches brute force on the bench graph " +
      "(order, degrees, jaccard) and the top-N cut is TakeOrdered") {
    val df = Graph.queries("g_linkpred_cn")(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq

    val und = GraphOps.lineitemGraph(spark, sfDir, Graph.TriMod).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).distinct.toSeq
    val want = brute(und, Graph.LpCnDegCap, Graph.LpCnTopN)
    assert(want.size == Graph.LpCnTopN, "fixture must fill the report")
    assert(got == want)
    // every reported pair is genuinely non-adjacent with a real overlap
    got.foreach { case (u, v, c, du, dv, j) =>
      assert(c >= 1L && j > 0.0 && j <= 1.0 && du >= c && dv >= c)
    }
    // scale shape: the global top-N cut the fit evaluates must be a
    // TakeOrderedAndProject (map-side partial top-N), never a full
    // global sort. The row itself serves the fit's 20-row checkpoint
    // (r20: only the finished cuts stay pinned), so assert on the
    // standalone composition the fit's expressions come from.
    val undDf = GraphOps.lineitemUndirected(spark, sfDir, Graph.TriMod)
    assert(Graph.linkPredCn(undDf, Graph.LpCnDegCap, Graph.LpCnTopN)
      .queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def bruteAa(und: Seq[(Long, Long)], cap: Int, topN: Int)
      : Seq[(Long, Long, Long, Double)] = {
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val edges = und.toSet
    val acc = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long)].withDefaultValue((0L, 0L))
    for ((w, ns) <- adj; if deg(w) >= 2 && deg(w) <= cap;
         u <- ns; v <- ns; if u < v) {
      val (c, s) = acc((u, v))
      // fixed-point micro-unit weight — the exact integer the row sums
      acc((u, v)) = (c + 1, s + math.round(1e6 / math.log(deg(w).toDouble)))
    }
    acc.toSeq.collect { case ((u, v), (c, s)) if !edges.contains((u, v)) =>
      (u, v, c, s.toDouble / 1e6)
    }.sortBy { case (u, v, _, s) => (-s, u, v) }.take(topN)
  }

  test("g_adamic_adar matches brute force on the bench graph and " +
      "ranks rare shared neighbors above hub-only overlap") {
    val df = Graph.queries("g_adamic_adar")(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3))).toSeq

    val und = GraphOps.lineitemGraph(spark, sfDir, Graph.TriMod).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).distinct.toSeq
    val want = bruteAa(und, Graph.LpCnDegCap, Graph.LpCnTopN)
    assert(want.size == Graph.LpCnTopN, "fixture must fill the report")
    assert(got == want)
    // each AA score is bounded by cn/ln(2) (every center has deg >= 2)
    got.foreach { case (_, _, c, s) =>
      assert(c >= 1L && s > 0.0 && s <= c.toDouble / math.log(2.0) + 1e-9)
    }
    // scale shape, same rationale as the linkpred test above
    val undDf = GraphOps.lineitemUndirected(spark, sfDir, Graph.TriMod)
    assert(Graph.adamicAdar(undDf, Graph.LpCnDegCap, Graph.LpCnTopN)
      .queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("adamic-adar weights: a degree-d center contributes 1/ln(d) " +
      "per pair, and degree-1 centers contribute nothing") {
    import spark.implicits._
    // center 0 with neighbors {1,2,3} (degree 3) plus a pendant 4-5
    // (both degree-1 — must produce no wedge and no div-by-zero).
    val und = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 5L))).toDF("a", "b")
    val got = Graph.adamicAdar(und, cap = 100, topN = 100).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2),
        r.getDouble(3)))).toMap
    val w = math.round(1e6 / math.log(3.0)).toDouble / 1e6
    assert(got == Map((1L, 2L) -> ((1L, w)), (1L, 3L) -> ((1L, w)),
      (2L, 3L) -> ((1L, w))))
  }

  test("g_pref_attach matches brute force over the top-degree head " +
      "and only scores non-adjacent pairs") {
    val df = Graph.queries("g_pref_attach")(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSeq

    val und = GraphOps.lineitemGraph(spark, sfDir, Graph.TriMod).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).distinct.toSeq
    val deg = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val head = deg.toSeq.sortBy { case (id, dg) => (-dg, id) }
      .take(Graph.PaTopDeg)
    val hd = head.toMap
    val edges = und.toSet
    val want = (for {
      (u, du) <- head; (v, dv) <- head
      if u < v && !edges.contains((u, v))
    } yield (u, v, du, dv, du * dv))
      .sortBy { case (u, v, _, _, pa) => (-pa, u, v) }.take(Graph.PaTopN)
    assert(want.size == Graph.PaTopN, "fixture must fill the report")
    assert(got == want)
    got.foreach { case (u, v, du, dv, pa) =>
      assert(!edges.contains((u, v)) && pa == du * dv &&
        hd(u) == du && hd(v) == dv)
    }
    // the dominance bound the plan-embedded guard enforces must hold on
    // the fixture — and it closes the exactness argument: every pair
    // with an endpoint OUTSIDE the head scores <= dmax·dbnd, so the head
    // answer (verified against head brute force above) IS the global
    // top-N.
    val dmax = deg.values.max
    val dbnd = deg.toSeq.sortBy { case (id, dg) => (-dg, id) }
      .drop(Graph.PaTopDeg).headOption.map(_._2).getOrElse(0L)
    assert(got.last._5 > dmax * dbnd,
      s"guard bound violated: min pa ${got.last._5} <= $dmax*$dbnd")
    // both the head cut and the report cut are map-side partial top-Ns
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("pref-attach ESCALATES on a hub near-clique where the base head " +
      "is not dominant, and the escalated answer is the global top-N") {
    import spark.implicits._
    // 4 hubs (clique, plus private leaves -> degree 9 each) and six
    // degree-3 mid nodes; head of topDeg=8 takes the hubs + 4 mids (id
    // tie-break), leaving 2 mids outside with dbnd=3. Surviving head
    // pairs are hub×mid and mid×mid with max score 27 = 9·3 — NOT
    // strictly above dmax·dbnd = 27 (an outside (hub, mid) pair ties and
    // can win the (pa desc, u, v) tie-break), so rung 8 must be REJECTED
    // — and the ladder's rung 32 (dbnd = 1, 27 > 9) accepted, reporting
    // the true global top-3 with the chosen head disclosed.
    val hubs = 0L to 3L
    val mids = 4L to 9L
    val hubClique = for (i <- hubs; j <- hubs; if i < j) yield (i, j)
    var leaf = 100L
    val hubLeaves = hubs.flatMap { h =>
      (1 to 6).map { _ => leaf += 1; (h, leaf) }
    }
    val midLeaves = mids.flatMap { m =>
      (1 to 3).map { _ => leaf += 1; (m, leaf) }
    }
    val und = (hubClique ++ hubLeaves ++ midLeaves).toDF("a", "b")
      .localCheckpoint(true)
    val got = Graph.prefAttach(und, topDeg = 8, topN = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getInt(5)))
      .toSeq
    // global top-3 non-adjacent pairs: hub×mid at 27 each, (pa desc, u, v)
    assert(got == Seq((0L, 4L, 27L, 32), (0L, 5L, 27L, 32),
      (0L, 6L, 27L, 32)))
  }

  test("pref-attach dbnd=0 acceptance (fewer-than-topN global answer) " +
      "and loud ladder exhaustion") {
    import spark.implicits._
    // K6 complete graph, topDeg = 1 → rungs 1/4/16. Rungs 1 and 4 reject
    // (all head pairs adjacent → npairs = 0 < topN, boundary degree 5 >
    // 0); rung 16 covers the whole 6-node graph → dbnd = 0 → ACCEPTED
    // with an empty result: the graph simply has no non-adjacent pair,
    // and the restricted answer is trivially global (the ADVICE case a
    // 'raise the head' error could never fix).
    val k6 = (for (i <- 0L to 5L; j <- 0L to 5L; if i < j) yield (i, j))
      .toDF("a", "b").localCheckpoint(true)
    assert(Graph.prefAttach(k6, topDeg = 1, topN = 3).collect().isEmpty)
    // K20: the last rung (16) still leaves 4 nodes outside (dbnd = 19 >
    // 0) with zero surviving pairs — genuine exhaustion must throw, not
    // report a restricted set as exact.
    val k20 = (for (i <- 0L to 19L; j <- 0L to 19L; if i < j) yield (i, j))
      .toDF("a", "b").localCheckpoint(true)
    val ex = intercept[Exception] {
      Graph.prefAttach(k20, topDeg = 1, topN = 3).collect()
    }
    assert(ex.getMessage.contains("no head in ladder"),
      s"wrong failure: ${ex.getMessage}")
  }

  test("pref-attach guard passes on a dominated head and the answer " +
      "equals the GLOBAL brute force over all nodes") {
    import spark.implicits._
    // 5 mutually non-adjacent hubs with distinct degrees 50..46 via
    // private leaves; head of topDeg=4 = hubs 0..3, dbnd = deg(4) = 46.
    // min top-3 pa = 48·47 = 2256... compute brute-force globally.
    val degs = Seq(50, 49, 48, 47, 46)
    var leaf = 1000L
    val undSeq = degs.zipWithIndex.flatMap { case (d, h) =>
      (1 to d).map { _ => leaf += 1; (h.toLong, leaf) }
    }
    val und = undSeq.toDF("a", "b").localCheckpoint(true)
    val got = Graph.prefAttach(und, topDeg = 4, topN = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    // global brute force over EVERY node (hubs and leaves)
    val deg = undSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val edges = undSeq.toSet
    val ids = deg.keys.toSeq.sorted
    val want = (for {
      u <- ids; v <- ids
      if u < v && !edges.contains((u, v))
    } yield (u, v, deg(u) * deg(v)))
      .sortBy { case (u, v, pa) => (-pa, u, v) }.take(3)
    assert(got == want)
  }

  test("Graph.invalidateModels drops the lpShared fit, unpins its " +
      "blocks, and the refit row reproduces the same answer") {
    val sc = spark.sparkContext
    val before = Graph.queries("g_adamic_adar")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq // triggers (or reuses) the session fit
    val pinned0 = graft.operators.SessionPins.pinned(sc)
    Graph.invalidateModels(spark, sfDir)
    val pinned1 = graft.operators.SessionPins.pinned(sc)
    assert(pinned1.size < pinned0.size,
      "invalidation must unpin the lpShared checkpoint blocks")
    val after = Graph.queries("g_adamic_adar")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq // REFIT from source — not a stale frame
    assert(after == before)
  }

  test("a binding degree cap excludes hub centers by contract") {
    import spark.implicits._
    // star hub 0 -- {1..5} (degree 5) plus an off-hub wedge 6-8-7
    // through the degree-2 center 8.
    val undSeq: Seq[(Long, Long)] =
      (1L to 5L).map(i => (0L, i)) ++ Seq((1L, 2L), (6L, 8L), (7L, 8L))
    val und = undSeq.toDF("a", "b")
    val capped = Graph.linkPredCn(und, cap = 4, topN = 100).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val full = Graph.linkPredCn(und, cap = 100, topN = 100).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // uncapped: every non-adjacent {1..5} pair shares the hub; capped:
    // the hub (degree 5 > 4) generates no wedges, so e.g. (2,5) loses
    // its only common neighbor — only the off-hub wedge (6,7) via the
    // degree-2 center 8 survives.
    assert(full.contains((2L, 5L)) && !capped.contains((2L, 5L)))
    assert(full.contains((6L, 7L)))
    assert(capped == Map((6L, 7L) -> 1L))
    // capped scores never exceed the uncapped (the lower-bound contract)
    capped.foreach { case (p, c) => assert(c <= full.getOrElse(p, 0L)) }
  }
}
