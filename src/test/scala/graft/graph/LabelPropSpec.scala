package graft.graph

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class LabelPropSpec extends SparkSpec {

  private def toyEdges = {
    val s = spark
    import s.implicits._
    // a triangle {1,2,3} with a pendant 4, plus an island edge {10,11};
    // the directed arc 3→1 must symmetrize.
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
  }

  test("hand-traced rounds: smallest-label tie-breaks and the 2-cycle " +
      "island") {
    val got = LabelProp.run(spark, toyEdges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: every node takes its smallest neighbor label
    //   1←{2,3}→2, 2←{1,3}→1, 3←{1,2,4}→1, 4←{3}→3, 10↔11 swap.
    // round 2: 1←{1(from 2),1(from 3)}→1, 2←{2,1}→1 (tie→smallest),
    //   3←{2,1,3}→1, 4←{1}→1, 10/11 swap back.
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 11L))
  }

  test("the per-round argmax cut compiles to WindowGroupLimit, not a " +
      "full per-node window sort") {
    val und = GraphOps.symmetrize(toyEdges)
    val labels = und.select(col("src").as("id"))
      .distinct().select(col("id"), col("id").as("label"))
    val plan = LabelProp.step(und, labels)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("g_label_prop: labels refine connected components and the run is " +
      "deterministic") {
    val Q = graft.queries.Graph
    val df = Q.queries("g_label_prop")(spark, sfDir)
    val labels = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    val comp = ConnectedComponents.run(spark,
        GraphOps.lineitemSubgraph(spark, sfDir, Q.CcMod, Q.CcQtyMax),
        Q.CcRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == comp.keySet)
    // a label can only ever travel along edges, so every adopted label
    // must name a node of the SAME component
    labels.foreach { case (v, l) =>
      assert(comp(l) == comp(v), s"node $v adopted cross-component label $l")
    }
    // and communities refine components strictly more finely or equally
    val nComms = labels.values.toSet.size
    val nComps = comp.values.toSet.size
    assert(nComms >= nComps)
    // the fixed schedule is deterministic end to end — compared against
    // a FRESH standalone run (the board row is session-served since the
    // r19 lpaShared fit, so a second row call alone would only read the
    // cache back)
    val again = LabelProp.run(spark,
        GraphOps.lineitemSubgraph(spark, sfDir, Q.CcMod, Q.CcQtyMax),
        Q.LpRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == labels)
  }
}
