package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CkptChain

/** Distributed minimum spanning forest — Borůvka's algorithm, the one MST
  * family member whose structure IS the distributed shape: every round,
  * each component picks its lightest outgoing edge (a per-key min — one
  * map-side-combined shuffle), the picked edges join the forest, and the
  * components they connect contract. Components at least halve per round,
  * so ⌈log₂ n⌉ rounds complete the forest (`rounds` is an upper bound;
  * the loop exits early on the first round with no inter-component edge).
  *
  * Determinism without distinct weights: edges compare as the STRUCT
  * (w, a, b) — a total order (edge keys are unique), so the forest is
  * the unique MSF of that order and a driver-side Kruskal under the same
  * order reproduces it edge-for-edge (MsfSpec) — ties in w alone cannot
  * make the result run-dependent.
  *
  * Scale shape (the 100 TB contract):
  *  - the weighted edge list is checkpointed once and re-joined per round
  *    with the n-row component labeling — the heavy side never reshuffles
  *    on anything but its 8-byte endpoint keys;
  *  - the per-component argmin is a min-struct aggregate (mergeable
  *    partial state, no window, no sort);
  *  - contraction runs [[ConnectedComponents.run]] on the ≤ components
  *    picked-edge pairs — the small side by construction — inheriting its
  *    two-regime dispatch (driver union-find when tiny, superstep
  *    pointer-jumping when not);
  *  - per-round state chains through [[CkptChain]]: generation N−1 is
  *    released as N lands.
  */
object MinSpanningForest {

  /** MSF of an undirected weighted edge list `(a, b, w)` (a < b, unique).
    * Returns the forest edges `(a, b, w)`.
    */
  def run(spark: SparkSession, und0: DataFrame, rounds: Int): DataFrame = {
    val ckpt = new CkptChain(spark.sparkContext)
    val fchain = new CkptChain(spark.sparkContext) // forest has its own
    val und = und0.select(col("a"), col("b"), col("w")).localCheckpoint(true)
    var comp = ckpt(
      und.select(col("a").as("node_id"))
        .unionAll(und.select(col("b").as("node_id")))
        .distinct()
        .select(col("node_id"), col("node_id").as("comp")))
    var forest = und.limit(0).localCheckpoint(true)
    var done = false
    var r = 0
    while (r < rounds && !done) {
      val e = und
        .join(comp.select(col("node_id").as("a"), col("comp").as("ca")),
          Seq("a"))
        .join(comp.select(col("node_id").as("b"), col("comp").as("cb")),
          Seq("b"))
        .where(col("ca") =!= col("cb"))
      val ed = struct(col("w"), col("a"), col("b")).as("ed")
      val chosen = e.select(col("ca").as("c"), ed)
        .unionAll(e.select(col("cb").as("c"), ed))
        .groupBy(col("c")).agg(min(col("ed")).as("m"))
        .select(col("m.a").as("a"), col("m.b").as("b"), col("m.w").as("w"))
        .distinct()
        .localCheckpoint(true)
      if (chosen.isEmpty) done = true
      else {
        forest = fchain(forest.unionAll(chosen))
        // contract the picked-edge graph over CURRENT component labels
        val pairs = chosen
          .join(comp.select(col("node_id").as("a"), col("comp").as("ca")),
            Seq("a"))
          .join(comp.select(col("node_id").as("b"), col("comp").as("cb")),
            Seq("b"))
          .select(col("ca").as("src"), col("cb").as("dst"))
        val merged = ConnectedComponents.run(spark, pairs, rounds)
          .select(col("node_id").as("oc"), col("comp").as("nc"))
        comp = ckpt(comp.as("x")
          .join(merged, col("x.comp") === col("oc"), "left")
          .select(col("x.node_id"),
            coalesce(col("nc"), col("x.comp")).as("comp")))
      }
      r += 1
    }
    forest
  }
}
