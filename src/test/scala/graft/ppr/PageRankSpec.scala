package graft.ppr

import graft.SparkSpec
import graft.graph.GraphOps

class PageRankSpec extends SparkSpec {

  test("global PageRank conserves rank mass and floors at the base term") {
    val edges = GraphOps.lineitemGraph(spark, sfDir, 97)
    val d = 0.85
    val pr = PageRank.run(spark, edges, d, iterations = 40).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = pr.size
    // every node present, Σr = 1 (teleport + dangling redistribution keep
    // total rank mass invariant), and r(v) >= (1-d)/n for all v.
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"mass ${pr.values.sum}")
    val base = (1.0 - d) / n
    pr.values.foreach(v => assert(v >= base - 1e-12))
    // uniform restart: ranks are NOT all equal — sanity that the kernel
    // differentiates nodes (the mod-97 graph is near-regular, so the
    // spread is modest).
    assert(pr.values.max > 1.2 * pr.values.min)
  }

  test("dangling mass redistributes uniformly (hand-checked 3-node chain)") {
    val s = spark
    import s.implicits._
    // 1 -> 2, 2 -> 3; node 3 dangles. Closed form after convergence is
    // checked against a tiny fixed-point iteration computed here.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val d = 0.85
    val got = PageRank.run(s, edges, d, iterations = 60).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var r = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    for (_ <- 1 to 60) {
      val dm = r(3L)
      val base = (1 - d) / 3 + d * dm / 3
      r = Map(1L -> base, 2L -> (base + d * r(1L)), 3L -> (base + d * r(2L)))
    }
    for (v <- 1L to 3L)
      assert(math.abs(got(v) - r(v)) < 1e-12, s"node $v: ${got(v)} vs ${r(v)}")
  }

  test("GraphXPpr.runBatch is per-source identical to the static library " +
      "path on BOTH dispatch arms (K10 batch soundness)") {
    // Spark 4.1.2's runParallelPersonalizedPageRank loses reachable mass
    // on PARTIAL source batches (see GraphXPpr.runBatch scaladoc); this
    // pins the contract that saves us from it: whatever the arm — the
    // all-sources parallel run (GOT: 107 <= limit) or the per-source
    // static loop (forced via allSourcesNodeLimit = 1) — each source's
    // vector equals a solo staticPersonalizedPageRank run.
    val edges = graft.graph.Got.edges(spark).localCheckpoint(true)
    val srcs = Seq(3L, 17L, 99L)
    val iters = 12
    def toMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val solo = srcs.flatMap { src =>
      GraphXPpr.run(spark, edges, src, 0.15, iters).collect()
        .map(r => (src, r.getLong(0)) -> r.getDouble(1))
    }.toMap
    for (limit <- Seq(GraphXPpr.AllSourcesNodeLimit, 1)) {
      val batch = toMap(GraphXPpr.runBatch(spark, edges, srcs, 0.15, iters,
        allSourcesNodeLimit = limit))
      assert(batch.keySet == solo.keySet,
        s"limit=$limit support mismatch: ${(batch.keySet diff solo.keySet).take(5)} / ${(solo.keySet diff batch.keySet).take(5)}")
      val maxDiff = solo.map { case (k, v) => math.abs(batch(k) - v) }.max
      assert(maxDiff < 1e-12, s"limit=$limit maxDiff=$maxDiff")
    }
  }

  test("GraphXPpr.runBatch fallback arm: 64-source batch unions in RDD " +
      "space (no linear unionAll plan blowup); empty sources is empty") {
    val edges = graft.graph.Got.edges(spark).localCheckpoint(true)
    // empty-sources guard: both arms, correct shape, no reduce() throw.
    val empty = GraphXPpr.runBatch(spark, edges, Nil, 0.15, 1)
    assert(empty.columns.toSeq == Seq("src", "node_id", "score"))
    assert(empty.count() == 0)
    val srcs = edges.select("src").distinct().collect()
      .map(_.getLong(0)).sorted.take(64).toSeq
    assert(srcs.length == 64)
    // the per-source static loop is inherently one Pregel run per source;
    // the COMBINE must stay flat. The old linear unionAll fold re-analyzed
    // an O(n)-deep plan per source (O(n²) driver analysis); a flat
    // sc.union keeps the whole batch inside a loose wall-time bound that
    // the quadratic driver path blew through.
    val t0 = System.nanoTime()
    val out = GraphXPpr.runBatch(spark, edges, srcs, 0.15, iterations = 1,
      allSourcesNodeLimit = 1)
    val bySrc = out.collect().groupBy(_.getLong(0))
    val dt = (System.nanoTime() - t0) / 1e9
    assert(bySrc.keySet == srcs.toSet, "every source must appear")
    // per-source Σ = 1 after normalization
    bySrc.values.foreach { rows =>
      val s = rows.map(_.getDouble(2)).sum
      assert(math.abs(s - 1.0) < 1e-9, s"per-source mass $s")
    }
    assert(dt < 180.0, s"64-source fallback batch took ${dt}s")
  }
}
