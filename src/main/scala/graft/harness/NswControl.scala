package graft.harness

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The NSW POSITIVE CONTROL (r18 verdict #2): the octave's near-iid
  * 80k-vector corpus read recall@5 0.12 at ef=16, root-caused to corpus
  * geometry ("cosines concentrate, no cluster structure — NN-descent's
  * per-round candidate budget covers ~0.3 % of the space"), and the
  * justifying claim — real embedding corpora are clustered and
  * NN-descent exploits cluster locality — was an argument, not a
  * measurement. This section runs the IDENTICAL build (same
  * [[graft.queries.Embeddings.nswGraphBuild]] code path, same rounds,
  * same M) and the identical ef-axis recall probe on a PLANTED-CLUSTER
  * corpus of the same size ([[ScaleBench.writeClusteredCorpus]]), and
  * adds the attribution diagnostics the deep-probe discipline demands:
  *
  *  - `cl_build_recall`: fraction of the exact top-k that appear as
  *    DIRECT out-edges of the query in the built graph — BUILD quality
  *    alone, no routing in the denominator;
  *  - `cl_cross_edges` / `cl_bridge_edges`: how the built graph
  *    connects clusters — whether the beam CAN route between them at
  *    all (a pure kNN graph over isolated islands disconnects — a
  *    routing-surface property, separate from build quality).
  *
  * So whatever the beam recall reads, the artifact says WHY.
  */
object NswControl {

  import Fmt.r1

  private def fmt4(x: Double): String =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble.toString

  /** Run the control at the given scale; returns the JSON fragment
    * (leading comma included) for the octave line. Drops its model
    * cache before returning so the pinned graph does not outlive the
    * section.
    */
  def section(spark: SparkSession, nVecs: Long, nClusters: Int,
      noise: Double, bridgeFrac: Double): String = {
    val E = graft.queries.Embeddings
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val out = body
      (out, (System.nanoTime() - t0) / 1e9)
    }
    val dir = ScaleBench.writeClusteredCorpus(spark, nVecs, nClusters,
      E.Dims, noise, bridgeFrac)
    val (clEdges, buildSec) = timed { E.nswGraph(spark, dir).count() }
    val (recall, recallSec) = timed {
      E.queries("e_nsw_recall")(spark, dir)
        .collect().map(r => (r.getInt(0), r.getDouble(3))).toSeq
    }
    val recallJson = recall
      .map { case (ef, rc) => s""""ef$ef":$rc""" }.mkString("{", ",", "}")

    // attribution diagnostics (untimed)
    val knn = E.nswGraph(spark, dir)
    val exact = E.queries("e_cosine_topk")(spark, dir)
      .where(col("rk") <= E.IvfTopK)
      .select(col("q_id"), col("vec_id"))
      .localCheckpoint(true)
    val nExact = exact.count()
    val nHit = exact.join(
      knn.selectExpr("src AS q_id", "dst AS vec_id")
        .where(col("q_id") < E.NumQueries),
      Seq("q_id", "vec_id"), "left_semi").count()
    // DEEP-BUDGET probes (the r18 octave discipline, extended to a
    // two-point budget axis): extra beams at 4× the row's hop budget,
    // at the row's ef=16 and at ef=64 — recall RISING with budget means
    // the cross-cluster paths exist but out-run the row's (ef, hop)
    // budget (the pure-kNN graph has no long-range links, so a
    // cross-cluster walk must traverse the bridge continuum — the exact
    // property HNSW's layer hierarchy exists to shortcut); flat would
    // mean the graph cannot route between clusters at all.
    val deepSteps = sys.env.getOrElse("GRAFT_NSWCL_DEEP_STEPS", "32").toInt
    val exactSet = exact.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (knnD, qD, nbrD, s0D) = E.nswShared(spark, dir)
    def deepRecallAt(ef: Int): Double = {
      val (_, visited) = E.nswBeam(knnD, qD, nbrD, s0D, ef,
        steps = deepSteps)
      val top = visited.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter(t => t._1 != t._2)
        .groupBy(_._1).values.flatMap(_.sortBy(t => (-t._3, t._2))
          .take(E.IvfTopK)).map(t => (t._1, t._2)).toSet
      exactSet.count(top.contains).toDouble / exactSet.size
    }
    val deep16 = deepRecallAt(16)
    val deep64 = deepRecallAt(64)
    val lab = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"))
    val edgeKinds = knn
      .join(lab.selectExpr("vec_id AS src", "label AS ls"), Seq("src"))
      .join(lab.selectExpr("vec_id AS dst", "label AS ld"), Seq("dst"))
      .agg(
        sum(when(col("ls") >= 0 && col("ld") >= 0 &&
          col("ls") =!= col("ld"), 1L).otherwise(0L)).as("cross"),
        sum(when(col("ls") < 0 || col("ld") < 0, 1L).otherwise(0L))
          .as("bridge"))
      .collect()(0)
    E.invalidateModels(spark, dir)

    s""","nsw_cl_vecs":$nVecs,"nsw_cl_clusters":$nClusters""" +
      s""","nsw_cl_noise":$noise,"nsw_cl_bridge_frac":$bridgeFrac""" +
      s""","nsw_cl_graph_edges":$clEdges""" +
      s""","nsw_cl_build_sec":${r1(buildSec)}""" +
      s""","nsw_cl_recall_sec":${r1(recallSec)}""" +
      s""","nsw_cl_recall_at5":$recallJson""" +
      s""","nsw_cl_build_recall":${fmt4(
        if (nExact > 0) nHit.toDouble / nExact else 0.0)}""" +
      s""","nsw_cl_cross_edges":${edgeKinds.getLong(0)}""" +
      s""","nsw_cl_bridge_edges":${edgeKinds.getLong(1)}""" +
      s""","nsw_cl_deep_steps":$deepSteps""" +
      s""","nsw_cl_recall_ef16_deep":${fmt4(deep16)}""" +
      s""","nsw_cl_recall_ef64_deep":${fmt4(deep64)}"""
  }

  /** Standalone runner (iteration / triage): env-sized, prints ONE JSON
    * line with the same fields the octave section embeds.
    */
  def main(args: Array[String]): Unit = {
    val loadStart = Fmt.loadAvg()
    val nVecs = sys.env.getOrElse("GRAFT_NSWCL_VECS", "80000").toLong
    val nClusters = sys.env.getOrElse("GRAFT_NSWCL_CLUSTERS", "64").toInt
    val noise = sys.env.getOrElse("GRAFT_NSWCL_NOISE", "0.3").toDouble
    val bridgeFrac =
      sys.env.getOrElse("GRAFT_NSWCL_BRIDGE", "0.3").toDouble
    val spark = graft.LocalSession.create()
    val frag = section(spark, nVecs, nClusters, noise, bridgeFrac)
    println(s"""{"metric":"nsw_control"$frag""" +
      s""","load_start":$loadStart,"load_end":${Fmt.loadAvg()}}""")
    spark.stop()
  }
}
