package graft.queries

import org.apache.spark.sql.functions.col
import graft.SparkSpec
import graft.graph.Got

/** Pins the r20 tagged recomposition bodies: `foraWholeBodyTagged` /
  * `foraTopkBodyTagged` run ONE SQL pass over the tagged artifact
  * tables, and each per-i slice must equal the per-point body (the
  * cross-engine text the oracle still replays) evaluated over that
  * point's artifact slice — on the REAL GOT artifacts, not a toy.
  */
class GotTaggedBodySpec extends SparkSpec {

  private def slices(df: org.apache.spark.sql.DataFrame, i: Int) =
    df.where(col("i") === i).drop("i").collect()
      .map(_.toSeq).toSet

  test("foraTopkBodyTagged slices equal the per-point foraTopkBody") {
    val s = spark
    val csr = Got.cachedCsr(s)
    val root = graft.VerifyArtifacts.dir(s, "spec_ftk_tagged")
    Graph.foraArtifactsMulti(s, csr, GotQueries.GridSources, root,
      GotQueries.GridForaTopkEpsilons.map { eps =>
        (g: graft.graph.Csr, src: Long) =>
          val t = graft.ppr.Fora.topkTrace(g, g.denseOf(src),
            GotQueries.GridK,
            graft.ppr.Fora.Conf(alpha = Got.Alpha, epsilon = eps))
          (t.reserve, t.residue, 0.0, t.numWalks, t.walks)
      })
    val st = s.read.parquet(s"$root/st")
    val sc = s.read.parquet(s"$root/sc")
    val wk = s.read.parquet(s"$root/wk")
    st.createOrReplaceTempView("sp_ftk_st")
    sc.createOrReplaceTempView("sp_ftk_sc")
    wk.createOrReplaceTempView("sp_ftk_wk")
    val tagged = s.sql(Graph.foraTopkBodyTagged("sp_ftk_st", "sp_ftk_sc",
      "sp_ftk_wk", k = GotQueries.GridK))
    GotQueries.GridForaTopkEpsilons.indices.foreach { i =>
      st.where(col("i") === i).drop("i")
        .createOrReplaceTempView(s"sp_ftk_st_$i")
      sc.where(col("i") === i).drop("i")
        .createOrReplaceTempView(s"sp_ftk_sc_$i")
      wk.where(col("i") === i).drop("i")
        .createOrReplaceTempView(s"sp_ftk_wk_$i")
      val point = s.sql(Graph.foraTopkBody(s"sp_ftk_st_$i",
          s"sp_ftk_sc_$i", s"sp_ftk_wk_$i", k = GotQueries.GridK))
        .collect().map(_.toSeq).toSet
      assert(slices(tagged, i) == point, s"topk slice $i diverged")
    }
  }

  test("foraWholeBodyTagged slices equal the per-point foraWholeBody") {
    val s = spark
    val csr = Got.cachedCsr(s)
    val root = graft.VerifyArtifacts.dir(s, "spec_fw_tagged")
    Graph.foraArtifactsMulti(s, csr, GotQueries.GridSources, root,
      GotQueries.GridForaEpsilons.map { eps =>
        (g: graft.graph.Csr, src: Long) =>
          val t = graft.ppr.Fora.wholeGraphTrace(g, g.denseOf(src),
            graft.ppr.Fora.Conf(alpha = Got.Alpha, epsilon = eps))
          (t.reserve, t.residue, t.rsum, t.numWalks, t.walks)
      })
    val st = s.read.parquet(s"$root/st")
    val sc = s.read.parquet(s"$root/sc")
    val wk = s.read.parquet(s"$root/wk")
    st.createOrReplaceTempView("sp_fw_st")
    sc.createOrReplaceTempView("sp_fw_sc")
    wk.createOrReplaceTempView("sp_fw_wk")
    val tagged = s.sql(Graph.foraWholeBodyTagged("sp_fw_st", "sp_fw_sc",
      "sp_fw_wk", alpha = Got.Alpha))
    GotQueries.GridForaEpsilons.indices.foreach { i =>
      st.where(col("i") === i).drop("i")
        .createOrReplaceTempView(s"sp_fw_st_$i")
      sc.where(col("i") === i).drop("i")
        .createOrReplaceTempView(s"sp_fw_sc_$i")
      wk.where(col("i") === i).drop("i")
        .createOrReplaceTempView(s"sp_fw_wk_$i")
      val point = s.sql(Graph.foraWholeBody(s"sp_fw_st_$i",
          s"sp_fw_sc_$i", s"sp_fw_wk_$i", alpha = Got.Alpha))
        .collect().map(_.toSeq).toSet
      assert(slices(tagged, i) == point, s"whole slice $i diverged")
    }
  }
}
