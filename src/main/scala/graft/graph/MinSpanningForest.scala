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
    *
    * r20 job-floor rework (guide §2.4/§1.2 — the round was ~7 scheduled
    * jobs, most of them bookkeeping on tiny frames):
    *  - the min-struct CARRIES the endpoints' component labels
    *    (`struct(w, a, b, ca, cb)` — the (w, a, b) prefix is already a
    *    total order over unique edge keys, so the tail never decides a
    *    comparison and the picked edge is unchanged), which deletes the
    *    two chosen↔comp joins that rebuilt (ca, cb) for contraction;
    *  - ONE count of the checkpointed pick table replaces both the
    *    `isEmpty` probe and [[ConnectedComponents.run]]'s internal
    *    persist+count (the pick count IS the contraction's edge count),
    *    via [[ConnectedComponents.runPreCounted]];
    *  - the forest is the UNION of the per-round pick checkpoints,
    *    assembled once at the end — the per-round forest re-checkpoint
    *    job is gone (each pick table is already a checkpoint, so the
    *    union's lineage stays flat).
    * Round jobs: pick-ckpt, count, contraction (collect when tiny /
    * supersteps at scale), comp-ckpt — down from seven.
    */
  def run(spark: SparkSession, und0: DataFrame, rounds: Int): DataFrame = {
    val ckpt = new CkptChain(spark.sparkContext)
    val und = und0.select(col("a"), col("b"), col("w")).localCheckpoint(true)
    var comp = ckpt(
      und.select(col("a").as("node_id"))
        .unionAll(und.select(col("b").as("node_id")))
        .distinct()
        .select(col("node_id"), col("node_id").as("comp")))
    val picks = Seq.newBuilder[DataFrame]
    var done = false
    var r = 0
    while (r < rounds && !done) {
      val e = und
        .join(comp.select(col("node_id").as("a"), col("comp").as("ca")),
          Seq("a"))
        .join(comp.select(col("node_id").as("b"), col("comp").as("cb")),
          Seq("b"))
        .where(col("ca") =!= col("cb"))
      val ed = struct(col("w"), col("a"), col("b"), col("ca"), col("cb"))
        .as("ed")
      // both component sides of each cut edge in ONE pass — the
      // unionAll spelling evaluated the 3-way join subtree twice per
      // round; explode emits the identical (c, ed) row pairs from one
      // evaluation.
      val chosen = e.select(ed,
          explode(array(col("ca"), col("cb"))).as("c"))
        .groupBy(col("c")).agg(min(col("ed")).as("m"))
        .select(col("m.a").as("a"), col("m.b").as("b"), col("m.w").as("w"),
          col("m.ca").as("ca"), col("m.cb").as("cb"))
        .distinct()
        .localCheckpoint(true)
      val nChosen = chosen.count()
      if (nChosen == 0) done = true
      else {
        picks += chosen.select(col("a"), col("b"), col("w"))
        // contract the picked-edge graph — the labels rode the pick
        val merged = ConnectedComponents.runPreCounted(spark,
            chosen.select(col("ca").as("src"), col("cb").as("dst")),
            rounds, nChosen)
          .select(col("node_id").as("oc"), col("comp").as("nc"))
        comp = ckpt(comp.as("x")
          .join(merged, col("x.comp") === col("oc"), "left")
          .select(col("x.node_id"),
            coalesce(col("nc"), col("x.comp")).as("comp")))
      }
      r += 1
    }
    picks.result().foldLeft(und.limit(0))(_ unionAll _)
  }

  /** DuckDB oracle: Borůvka replayed as unrolled CTEs — `outer` rounds,
    * each recomputing the forest-so-far component labeling from scratch
    * with `inner` unrolled jump-accelerated min-label steps (the
    * [[ConnectedComponents.oracleSql]] schedule over forest edges only),
    * then the per-label-class min-(w, a, b) pick via a windowed rank and
    * the forest union. The ROUND STRUCTURE need not mirror [[run]]'s
    * contraction bookkeeping: edges compare as the (w, a, b) total
    * order, so any converged Borůvka yields THE unique MSF of that
    * order — the same forest the Spark kernel and MsfSpec's Kruskal
    * produce.
    *
    * SOUNDNESS does not depend on the labeling converging: a label
    * class S (converged or not) defines the cut (S, V∖S), its pick is
    * the minimum edge across that cut, and under a total order the
    * cut-minimal edge is ALWAYS an MSF edge (cut property) — so an
    * under-converged labeling can only re-pick forest edges already
    * present (tree diameter ≫ graph diameter is exactly where the
    * fixed `inner` budget lags; observed on the sf0.001 giant tree),
    * never admit a wrong one. The final DISTINCT folds those
    * re-picks. COMPLETENESS (every MSF edge arrived within `outer`
    * rounds) is what the driver's row-count + hash compare against the
    * converged Spark forest verifies at each scale. Every CTE is
    * MATERIALIZED — DuckDB 1.0 inlines twice-referenced CTEs and an
    * unrolled iteration would blow up exponentially otherwise.
    *
    * `graphSql` must yield directed `(src, dst)` pairs; `weightSql` is
    * an expression over columns `a`/`b` (the canonicalized undirected
    * endpoints). Output: the forest `(a, b, w)`.
    */
  def oracleSql(graphSql: String, weightSql: String, outer: Int,
      inner: Int): String = {
    val sb = new StringBuilder
    sb ++= s"WITH e0 AS MATERIALIZED ($graphSql),\n"
    sb ++= "eu AS MATERIALIZED (SELECT a, b, CAST(" + weightSql +
      " AS BIGINT) AS w FROM (SELECT DISTINCT least(src, dst) AS a, " +
      "greatest(src, dst) AS b FROM e0)),\n"
    sb ++= "nodes AS MATERIALIZED (SELECT DISTINCT a AS id FROM eu " +
      "UNION SELECT b AS id FROM eu),\n"
    sb ++= "f0 AS MATERIALIZED (SELECT a, b, w FROM eu WHERE 1 = 0),\n"
    for (r <- 1 to outer) {
      val pf = s"f${r - 1}"
      sb ++= s"r${r}adj AS MATERIALIZED (SELECT a AS src, b AS dst " +
        s"FROM $pf UNION ALL SELECT b AS src, a AS dst FROM $pf),\n"
      // labels CARRY across rounds (round 1 starts from identity): a
      // fresh identity restart would recompute the identical
      // non-converged labeling once the forest stops growing — a fixed
      // point short of the MSF (observed at sf0.01). Carried labels are
      // sound by the same cut-property argument (any label class is an
      // arbitrary cut side) and make the cumulative inner budget
      // outer×inner steps, monotonically decreasing toward the true
      // component minima.
      sb ++= (if (r == 1)
        s"r${r}l0 AS MATERIALIZED (SELECT id, id AS lab FROM nodes),\n"
      else
        s"r${r}l0 AS MATERIALIZED (SELECT id, lab FROM r${r - 1}l$inner),\n")
      for (i <- 1 to inner) {
        val pl = s"r${r}l${i - 1}"
        sb ++= s"r${r}a$i AS MATERIALIZED (SELECT id, min(lab) AS lab " +
          s"FROM (SELECT a.dst AS id, t.lab FROM r${r}adj a " +
          s"JOIN $pl t ON a.src = t.id " +
          s"UNION ALL SELECT id, lab FROM $pl) u GROUP BY id),\n"
        sb ++= s"r${r}l$i AS MATERIALIZED (SELECT t.id, j.lab " +
          s"FROM r${r}a$i t JOIN r${r}a$i j ON t.lab = j.id),\n"
      }
      sb ++= s"r${r}cr AS MATERIALIZED (SELECT e.a, e.b, e.w, " +
        s"ca.lab AS ca, cb.lab AS cb FROM eu e " +
        s"JOIN r${r}l$inner ca ON ca.id = e.a " +
        s"JOIN r${r}l$inner cb ON cb.id = e.b WHERE ca.lab <> cb.lab),\n"
      sb ++= s"r${r}ch AS MATERIALIZED (SELECT DISTINCT a, b, w FROM (" +
        s"SELECT a, b, w, row_number() OVER (PARTITION BY c " +
        s"ORDER BY w, a, b) AS rn FROM (" +
        s"SELECT ca AS c, a, b, w FROM r${r}cr " +
        s"UNION ALL SELECT cb AS c, a, b, w FROM r${r}cr) s) p " +
        s"WHERE rn = 1),\n"
      sb ++= s"f$r AS MATERIALIZED (SELECT a, b, w FROM f${r - 1} " +
        s"UNION ALL SELECT a, b, w FROM r${r}ch),\n"
    }
    sb.setLength(sb.length - 2)
    sb ++= s"\nSELECT DISTINCT a, b, w FROM f$outer"
    sb.toString
  }
}
