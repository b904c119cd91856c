package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  private def edgesDf = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
  }

  test("outDegrees / inDegrees") {
    val out = GraphOps.outDegrees(edgesDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    val in = GraphOps.inDegrees(edgesDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(in == Map(2L -> 1L, 3L -> 2L, 1L -> 1L))
  }

  test("symmetrize doubles directed edges and dedups") {
    val sym = GraphOps.symmetrize(edgesDf)
    // pairs {1,2},{1,3},{2,3} in both directions; (1,3)/(3,1) dedup.
    assert(sym.count() == 6)
    val pairs = sym.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 1L)) && pairs.contains((1L, 2L)))
  }

  test("CSR round-trips ids, degrees, sorted neighbors") {
    val csr = GraphOps.buildCsr(edgesDf)
    assert(csr.numNodes == 3 && csr.numEdges == 4)
    val d1 = csr.denseOf(1L)
    assert(csr.outDegree(d1) == 2)
    val nbrs = (0 until csr.outDegree(d1)).map(k => csr.originalOf(csr.neighbor(d1, k)))
    assert(nbrs == Seq(2L, 3L))
    assert(csr.denseOf(99L) == -1)
  }

  test("lineitemGraph has no self loops and is distinct") {
    val g = GraphOps.lineitemGraph(spark, sfDir, 97)
    assert(g.where(col("src") === col("dst")).count() == 0)
    assert(g.count() == g.distinct().count())
  }

  test("lineitemUndirected snapshot == the inline least/greatest " +
      "distinct derivation, is served cached, and refits after " +
      "invalidateGraphs") {
    val direct = GraphOps.lineitemGraph(spark, sfDir, 97)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val und = GraphOps.lineitemUndirected(spark, sfDir, 97)
    val got = und.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == direct && got.nonEmpty)
    assert(got.forall { case (a, b) => a < b })
    // served: the second call returns the SAME snapshot instance
    assert(GraphOps.lineitemUndirected(spark, sfDir, 97) eq und)
    // re-ingest contract: invalidation refits from source to the same
    // answer (not a stale frame)
    GraphOps.invalidateGraphs(spark, sfDir)
    val refit = GraphOps.lineitemUndirected(spark, sfDir, 97)
    assert(!(refit eq und))
    assert(refit.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == direct)
  }

  test("lineitemFlickrGraph: ids in range, symmetric, hub-skewed, deterministic") {
    // sf0.001 keeps the spec fast; the derivation's SHAPE properties are
    // scale-free (the committed 4-scale artifact pins the sf0.1 numbers:
    // 80,513 nodes / 11,938,804 directed edges, max degree 18,609).
    val g = GraphOps.lineitemFlickrGraph(spark, sfDir).localCheckpoint(true)
    val mod = 80513L
    // (a) every id in [0, mod), no self loops, deduped
    assert(g.where(col("src") < 0 || col("src") >= mod ||
      col("dst") < 0 || col("dst") >= mod).count() == 0)
    assert(g.where(col("src") === col("dst")).count() == 0)
    val n = g.count()
    assert(n == g.distinct().count())
    // (b) undirected semantics: the edge set is closed under reversal
    val rev = g.select(col("dst").as("src"), col("src").as("dst"))
    assert(g.union(rev).distinct().count() == n)
    // (c) the u² concentration produces real hubs even at this scale:
    // max degree well above the typical node (sf0.1 measures 18,609 vs
    // median 129 — here the corpus is 100× smaller, so pin a loose 20×)
    val degs = g.groupBy("src").agg(count(lit(1)).as("d"))
      .select(max(col("d")), expr("percentile_approx(d, 0.5)")).collect()(0)
    val (maxD, medD) = (degs.getLong(0), degs.getLong(1))
    assert(maxD >= 20 * math.max(1L, medD), s"max $maxD median $medD")
    // (d) deterministic: a rebuild reproduces the exact edge set
    assert(GraphOps.lineitemFlickrGraph(spark, sfDir)
      .exceptAll(g).count() == 0)
  }

  test("the g_bwdsearch_skew fixture keeps the hub-skew profile at its " +
      "downscaled mod, and every oracle target exists in the snapshot") {
    val Q = graft.queries.Graph
    val g = GraphOps.lineitemFlickrGraph(spark, sfDir, Q.SkewMod, Q.SkewFan)
      .localCheckpoint(true)
    // hub skew survives the downscale: the quadratic map saturates the
    // low-id hubs near mod while the tail stays sparse
    val degs = g.groupBy("src").agg(count(lit(1)).as("d"))
      .select(max(col("d")), expr("percentile_approx(d, 0.5)")).collect()(0)
    val (maxD, medD) = (degs.getLong(0), degs.getLong(1))
    assert(maxD >= 10 * math.max(1L, medD), s"max $maxD median $medD")
    // every skew target exists in the snapshot (the oracle seeds them
    // unconditionally, so a missing one would silently drop rows)
    val csr = GraphOps.lineitemFlickrCsr(spark, sfDir, Q.SkewMod, Q.SkewFan)
    Q.SkewTargets.foreach(t => assert(csr.denseOf(t) >= 0, s"target $t"))
    // (the DuckDB-dialect twin SQL cannot execute under Spark — xor()/>>
    // spellings differ by design; edge-set equality across engines is
    // pinned END TO END by the g_bwdsearch_skew correctness row, whose
    // oracle derives the graph in DuckDB and hash-matches the kernel
    // output over it at both verify scales)
  }
}
