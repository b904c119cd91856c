package graft.ppr

import graft.SparkSpec
import graft.queries.Graph
import org.apache.spark.sql.DataFrame

/** Pins the tag-batched PPR family ([[PprFamily.runThree]], r18 verdict
  * #1) against the three standalone superstep loops it replaces: every
  * per-family slice must reproduce the standalone run — on a toy graph
  * whose dangling nodes exercise all three restart rules (back-to-source
  * vs fresh-uniform(S) vs uniform-over-all), on a schedule where the
  * PageRank horizon ends BEFORE the PPR pair's (the freeze path), and on
  * the bench graph the board rows serve.
  */
class PprFamilySpec extends SparkSpec {

  private def toMap(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def sliceMap(fam: DataFrame, tag: Int): Map[Long, Double] = {
    import org.apache.spark.sql.functions.col
    fam.where(col("fam") === tag).select("node_id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  private def assertClose(got: Map[Long, Double], want: Map[Long, Double],
      what: String): Unit = {
    assert(got.keySet == want.keySet, s"$what node sets differ")
    got.foreach { case (id, v) =>
      assert(math.abs(v - want(id)) <= 1e-12 * math.max(1.0, math.abs(v)),
        s"$what diverged at node $id: $v vs ${want(id)}")
    }
  }

  // toy graph: 0→1→2, 2 is dangling, 3 isolated-but-seeded via dangling
  // chain 1→3, 3 dangling too — both dangling rules carry real mass.
  private def toyEdges = {
    val s = spark
    import s.implicits._
    Seq((0L, 1L), (1L, 2L), (1L, 3L), (2L, 0L), (4L, 0L), (5L, 4L))
      .toDF("src", "dst").localCheckpoint(true)
  }

  test("runThree slices equal the standalone runs on a dangling toy " +
      "graph (same schedule)") {
    val edges = toyEdges
    val seeds = Seq(0L, 4L)
    val fam = PprFamily.runThree(spark, edges, source = 0L, seeds = seeds,
      alpha = 0.15, iters = 8, damping = 0.85, prIters = 7)
      .localCheckpoint(true)
    assertClose(sliceMap(fam, PprFamily.FamPower),
      toMap(PowerIteration.run(spark, edges, 0L, 0.15, 8)), "power")
    assertClose(sliceMap(fam, PprFamily.FamSeed),
      toMap(PowerIteration.runSeedSet(spark, edges, seeds, 0.15, 8)),
      "seedset")
    assertClose(sliceMap(fam, PprFamily.FamRank),
      toMap(PageRank.run(spark, edges, 0.85, 7)), "pagerank")
  }

  test("a family whose horizon ends first is frozen, not advanced: " +
      "prIters < iters-1 and iters-1 < prIters both reproduce the " +
      "standalone schedules") {
    val edges = toyEdges
    val seeds = Seq(1L, 2L)
    // PageRank ends first — frozen through the PPR pair's tail steps
    val famA = PprFamily.runThree(spark, edges, 0L, seeds,
      0.15, iters = 9, damping = 0.85, prIters = 3).localCheckpoint(true)
    assertClose(sliceMap(famA, PprFamily.FamRank),
      toMap(PageRank.run(spark, edges, 0.85, 3)), "pagerank-short")
    assertClose(sliceMap(famA, PprFamily.FamPower),
      toMap(PowerIteration.run(spark, edges, 0L, 0.15, 9)), "power-long")
    // the PPR pair ends first — frozen through PageRank's tail steps
    val famB = PprFamily.runThree(spark, edges, 0L, seeds,
      0.15, iters = 3, damping = 0.85, prIters = 9).localCheckpoint(true)
    assertClose(sliceMap(famB, PprFamily.FamPower),
      toMap(PowerIteration.run(spark, edges, 0L, 0.15, 3)), "power-short")
    assertClose(sliceMap(famB, PprFamily.FamSeed),
      toMap(PowerIteration.runSeedSet(spark, edges, seeds, 0.15, 3)),
      "seedset-short")
    assertClose(sliceMap(famB, PprFamily.FamRank),
      toMap(PageRank.run(spark, edges, 0.85, 9)), "pagerank-long")
  }

  test("the served board slices equal the standalone runs on the bench " +
      "graph at the board schedule") {
    import graft.graph.GraphOps
    val edges = GraphOps.lineitemGraph(spark, sfDir, Graph.Mod)
      .localCheckpoint(true)
    val fam = Graph.pprFamilyShared(spark, sfDir)
    assertClose(sliceMap(fam, PprFamily.FamPower),
      toMap(PowerIteration.run(spark, edges, Graph.SingleSource,
        Graph.Alpha, Graph.Iters)), "bench power")
    assertClose(sliceMap(fam, PprFamily.FamSeed),
      toMap(PowerIteration.runSeedSet(spark, edges, Graph.SeedSet,
        Graph.Alpha, Graph.Iters)), "bench seedset")
    assertClose(sliceMap(fam, PprFamily.FamRank),
      toMap(PageRank.run(spark, edges, Graph.PrDamping, Graph.PrIters)),
      "bench pagerank")
  }

  test("Graph.invalidateModels drops the pprFamily fit, unpins its " +
      "blocks, and the refit rows reproduce the same answer") {
    val sc = spark.sparkContext
    val before = Graph.queries("g_pagerank")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val pinned0 = graft.operators.SessionPins.pinned(sc)
    Graph.invalidateModels(spark, sfDir)
    val pinned1 = graft.operators.SessionPins.pinned(sc)
    assert(pinned1.size < pinned0.size,
      "invalidation must unpin the pprFamily checkpoint blocks")
    val after = Graph.queries("g_pagerank")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(after == before)
  }
}
