package graft.ppr

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** The PPR superstep FAMILY, tag-batched (r18 verdict #1): single-source
  * power iteration ([[PowerIteration.run]]), seed-set PPR
  * ([[PowerIteration.runSeedSet]]) and global PageRank ([[PageRank.run]])
  * are three fixed-schedule single-shuffle loops over the SAME graph that
  * differ only in restart vector and dangling term — run separately they
  * pay the per-superstep job floor three times. This object runs all
  * three in ONE family-tagged state frame (the
  * `Embeddings.nswBeamBatch` discipline): every join and groupBy is
  * keyed on `(fam, id)`, the per-family pre-weighted edge lists (each
  * with its own dangling rule folded in as synthetic edges, or none for
  * PageRank whose dangling mass is a per-superstep scalar) union into one
  * hash-partitioned adjacency, and one superstep is exactly ONE
  * union-carrier shuffle for the whole family.
  *
  * Per-family slices are expression-for-expression the standalone runs
  * (PprFamilySpec pins slice ≡ standalone on a dangling toy graph AND the
  * bench graph): the `when(fam, …)` branches evaluate the standalone
  * expressions verbatim per row, carriers contribute exact 0.0 terms to
  * the group sums, and a family whose schedule ends before the longest
  * one is FROZEN — excluded from the frontier, its carrier passing `r`
  * through the group sum as the single term, which is exact.
  *
  * Scale shape is unchanged from the standalone runs: size-guarded
  * frontier broadcast (shuffle-free probes on a broadcastable graph, a
  * frontier-only shuffle against the pre-partitioned edge side past the
  * limit), chained per-superstep localCheckpoints, AQE off and shuffle
  * width scoped to the graph for the loop's duration.
  */
object PprFamily {

  /** Family tags — small ints so the shuffle key stays 12 bytes. */
  val FamPower = 0
  val FamSeed = 1
  val FamRank = 2

  /** Run the three-member family in one tagged superstep loop.
    * Returns `(fam INT, node_id LONG, score DOUBLE)` where the
    * [[FamPower]]/[[FamSeed]] slices are the α·Σresidue reserves of the
    * standalone runs (zero-score nodes absent) and the [[FamRank]] slice
    * is global PageRank over every node. The returned frame is a narrow
    * projection off the final chained checkpoint — slicing it per family
    * re-reads the checkpoint, never the loop.
    */
  def runThree(
      spark: SparkSession,
      edges: DataFrame,
      source: Long,
      seeds: Seq[Long],
      alpha: Double,
      iters: Int,
      damping: Double,
      prIters: Int,
      broadcastNodeLimit: Long = PowerIteration.BroadcastNodeLimit)
      : DataFrame = {
    import spark.implicits._
    require(seeds.nonEmpty && seeds.distinct.size == seeds.size,
      s"seed set must be non-empty and duplicate-free, got $seeds")
    require(iters >= 1 && prIters >= 1,
      s"need iters >= 1 and prIters >= 1, got $iters/$prIters")
    val sc = spark.sparkContext
    val invK = 1.0 / seeds.size

    def trackedCkpt(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def release(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))

    // ---- shared setup: ONE edge scan feeds all three families --------
    val e = edges.persist()
    val deg = GraphOps.outDegrees(e)
    val m = e.count()
    // the union adjacency holds ~3 weighted copies of the graph; width
    // scoped to that (same rationale as the standalone runs).
    val p = math.min(sc.defaultParallelism.toLong,
      3L * m / 1000000L + 1L).toInt

    // per-family pre-weighted edges — the standalone runs' expressions
    // verbatim (w = 1/deg for the PPR pair, damping/deg for PageRank),
    // each family's dangling rule folded in exactly as its standalone
    // setup does.
    val weightedP = e.join(deg, e("src") === deg("id"))
      .select(e("src"), e("dst"), (lit(1.0) / col("deg")).as("w"))
    val danglingP = e.select(col("dst").as("src"))
      .union(Seq(source).toDF("src"))
      .distinct()
      .join(deg, col("src") === deg("id"), "left_anti")
      .select(col("src"), lit(source).as("dst"), lit(1.0).as("w"))
    val danglingS = e.select(col("dst").as("src"))
      .union(seeds.toDF("src"))
      .distinct()
      .join(deg, col("src") === deg("id"), "left_anti")
      .crossJoin(seeds.toDF("dst"))
      .select(col("src"), col("dst"), lit(invK).as("w"))
    val weightedG = e.join(deg, e("src") === deg("id"))
      .select(e("src"), e("dst"), (lit(damping) / col("deg")).as("w"))

    def tagged(df: DataFrame, fam: Int): DataFrame =
      df.select(lit(fam).as("fam"), col("src"), col("dst"), col("w"))
    val (ew, ewIds) = trackedCkpt(
      tagged(weightedP.union(danglingP), FamPower)
        .union(tagged(weightedP.union(danglingS), FamSeed))
        .union(tagged(weightedG, FamRank))
        .repartition(p, col("fam"), col("src")))
    e.unpersist()

    // PageRank's node table with the FIXED dangling flag (see
    // [[PageRank.run]]) — also the r0 = 1/n restart vector.
    val (nodes, nodesIds) = trackedCkpt(
      ew.where(col("fam") === FamRank).select(col("src").as("id"))
        .union(ew.where(col("fam") === FamRank).select(col("dst").as("id")))
        .distinct()
        .join(ew.where(col("fam") === FamRank)
          .select(col("src").as("id")).distinct()
          .withColumn("has_out", lit(1)), Seq("id"), "left")
        .select(col("id"), col("has_out").isNull.as("dang")))
    val n = nodes.count().toDouble
    val base1 = (1.0 - damping) / n
    val small = n <= broadcastNodeLimit
    def sided(df: DataFrame): DataFrame = if (small) broadcast(df) else df

    // merged schedule: the PPR pair pushes at supersteps 1..iters-1, the
    // PageRank recurrence updates at supersteps 1..prIters; a family
    // past its horizon is FROZEN (pass-through carrier).
    val totalSteps = math.max(iters - 1, prIters)

    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevCodegen = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      if (p == 1) spark.conf.set("spark.sql.codegen.wholeStage", "false")

      val checkpoint = new graft.operators.CkptChain(sc)
      // unified state (fam, id, r, acc, dang): acc is the PPR pair's
      // residue accumulator (0 for PageRank), dang is PageRank's fixed
      // flag (false for the PPR pair).
      var state = checkpoint(
        Seq((FamPower, source, 1.0, 1.0)).toDF("fam", "id", "r", "acc")
          .union(seeds.map(s => (FamSeed, s, invK, invK))
            .toDF("fam", "id", "r", "acc"))
          .withColumn("dang", lit(false))
          .unionByName(nodes.select(lit(FamRank).as("fam"), col("id"),
            (lit(1.0) / n).as("r"), lit(0.0).as("acc"), col("dang"))))
      var it = 1
      while (it <= totalSteps) {
        val pActive = it <= iters - 1
        val gActive = it <= prIters
        val frozen: Seq[Int] =
          (if (pActive) Nil else Seq(FamPower, FamSeed)) ++
            (if (gActive) Nil else Seq(FamRank))
        val frontier0 = state.where(col("r") =!= 0.0)
        // frontier columns RENAMED before the join: after superstep 1
        // the state's fam/id attributes descend from ew's, so an
        // ew("fam") === frontier("fam") predicate would be a self-join
        // ambiguity Spark only heals with a warning per superstep.
        val frontier = (if (frozen.isEmpty) frontier0
          else frontier0.where(!col("fam").isin(frozen.map(Int.box): _*)))
          .select(col("fam").as("f_fam"), col("id").as("f_id"), col("r"))
        // the standalone contribution expressions, branch-selected per
        // family: (1-α)·r·w for the PPR pair (which also accumulates),
        // r·w for PageRank (damping already in w, no accumulator).
        val cExpr: Column = when(ew("fam") === FamRank, col("r") * col("w"))
          .otherwise(lit(1.0 - alpha) * col("r") * col("w"))
        val contrib = ew.join(sided(frontier),
            ew("fam") === col("f_fam") && ew("src") === col("f_id"))
          .select(ew("fam"), ew("dst").as("id"), cExpr.as("c"),
            when(ew("fam") === FamRank, lit(0.0)).otherwise(cExpr).as("a"),
            lit(0).as("dg"))
        val carry = state.select(col("fam"), col("id"),
          (if (frozen.isEmpty) lit(0.0)
           else when(col("fam").isin(frozen.map(Int.box): _*), col("r"))
             .otherwise(lit(0.0))).as("c"),
          col("acc").as("a"), col("dang").cast("int").as("dg"))
        val grouped = contrib.union(carry)
          .groupBy("fam", "id")
          .agg(sum(col("c")).as("p"), sum(col("a")).as("acc"),
            max(col("dg")).as("dgi"))
        val next =
          if (!gActive) {
            grouped.select(col("fam"), col("id"), col("p").as("r"),
              col("acc"), (col("dgi") === 1).as("dang"))
          } else {
            // PageRank's dangling mass: a 1-row conditional aggregate
            // over the FamRank slice of the previous state, folded into
            // the base term — plain cross join on the small path (one
            // job per superstep), broadcast at scale (see
            // [[PageRank.run]]).
            val dm0 = state.where(col("fam") === FamRank)
              .agg(coalesce(sum(when(col("dang"), col("r"))), lit(0.0))
                .as("dm"))
            val dm = if (small) dm0 else broadcast(dm0)
            grouped.crossJoin(dm)
              .select(col("fam"), col("id"),
                when(col("fam") === FamRank,
                  lit(base1) + lit(damping) * col("dm") / n + col("p"))
                  .otherwise(col("p")).as("r"),
                col("acc"), (col("dgi") === 1).as("dang"))
          }
        state = checkpoint(next)
        it += 1
      }
      state.select(col("fam"), col("id").as("node_id"),
        when(col("fam") === FamRank, col("r"))
          .otherwise(lit(alpha) * col("acc")).as("score"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.codegen.wholeStage", prevCodegen)
      release(ewIds)
      release(nodesIds)
    }
  }
}
