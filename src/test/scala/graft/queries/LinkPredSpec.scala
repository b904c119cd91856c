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
    // scale shape: global top-N must be a TakeOrderedAndProject
    // (map-side partial top-N), never a full global sort.
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
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
