package graft.ppr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class BaseSpec extends SparkSpec {

  private def edgesDf = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
  }

  test("all-pair table inverts backward search to source-major") {
    val ap = Base.allPairs(spark, edgesDf, 0.15, 1e-8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // spot-check against forward power iteration per source.
    val csr = graft.graph.GraphOps.buildCsr(edgesDf)
    for (s <- Seq(1L, 2L, 3L)) {
      val exact = PowerIteration.runLocal(csr, csr.denseOf(s), 0.15, 500)
      for (t <- Seq(1L, 2L, 3L)) {
        val e = exact(csr.denseOf(t))
        val a = ap.getOrElse((s, t), 0.0)
        assert(math.abs(e - a) < 1e-5, s"π($s,$t): exact=$e base=$a")
      }
    }
  }

  test("the shared all-pair fit: g_base_allpair == a fresh uncached " +
      "sweep, g_base_topk == the rank cut over it, and invalidation " +
      "refits to the same answer") {
    import graft.queries.Graph
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // fresh sweep, bypassing the session fit — the row's previous body
    val fresh = Base.allPairs(spark,
        graft.graph.GraphOps.lineitemGraph(spark, sfDir, Graph.BaseMod),
        Graph.Alpha, Graph.BaseRmax, Graph.BaseSupersteps)
      .select(col("src"), col("dst"), round(col("score"), 9).as("score"))
      .where(col("score") >= Graph.BaseThreshold)
    val freshAp = canon(fresh)
    val ap0 = canon(Graph.queries("g_base_allpair")(spark, sfDir))
    assert(ap0 == freshAp && ap0.nonEmpty)
    val topk0 = Graph.queries("g_base_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val topkFresh = Base.topkTable(fresh, Graph.TopK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(topk0 == topkFresh)
    // re-ingest contract: refit from source, same answer
    Graph.invalidateModels(spark, sfDir)
    assert(canon(Graph.queries("g_base_allpair")(spark, sfDir)) == freshAp)
  }

  test("store round-trip with partition pruning, size, delete") {
    val dir = Files.createTempDirectory("base_store").toString + "/ppr"
    val ap = Base.allPairs(spark, edgesDf, 0.15, 1e-6)
    Base.writeStore(ap, dir)
    assert(Base.storeSize(spark, dir) > 0)

    val one = Base.readSource(spark, dir, 1L)
    // the pruned read equals the in-memory slice.
    val expected = ap.where(col("src") === 1L)
      .select(col("dst"), col("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = one.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected)

    // partition pruning visible in the physical plan.
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || got.nonEmpty)

    assert(Base.deleteStore(spark, dir))
    assert(Base.storeSize(spark, dir) == 0)
  }

  test("top-k store mode: rank-truncated, tie-inclusive, rank-ordered read") {
    val dir = Files.createTempDirectory("base_topk").toString + "/ppr"
    val k = 2
    val ap = Base.allPairs(spark, edgesDf, 0.15, 1e-6)
    Base.writeTopkStore(ap, dir, k)

    val full = ap.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (s <- Seq(1L, 2L, 3L)) {
      val rows = Base.readTopkSource(spark, dir, s).collect()
      // read-back order IS rank order (T5 insertion-order semantics).
      assert(rows.map(_.getInt(2)).toSeq == rows.map(_.getInt(2)).sorted.toSeq)
      assert(rows.map(r => r.getDouble(1)).toSeq ==
        rows.map(_.getDouble(1)).sortBy(-(_: Double)).toSeq)
      // tie-inclusive kth cut: every stored score >= every dropped score.
      val stored = rows.map(r => r.getLong(0)).toSet
      val dropped = full.collect { case ((`s`, t), p) if !stored(t) => p }
      assert(rows.length >= math.min(k, full.count(_._1._1 == s)))
      if (dropped.nonEmpty)
        assert(rows.map(_.getDouble(1)).min >= dropped.max)
    }
    assert(Base.storeSize(spark, dir) > 0)
    assert(Base.deleteStore(spark, dir))
  }
}
