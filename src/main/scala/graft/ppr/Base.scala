package graft.ppr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{Csr, GraphOps}

/** K9 — BASE all-pair PPR preprocessing + lookup store (SURVEY §2.8 K9,
  * §1.1 D5/D6, §2.1 S7-S9; reference `Base_Whole_Graph.java:58-164`).
  *
  * The reference runs backward search for EVERY node as target, inverts the
  * per-target columns into a source-major map, threshold-filters, and
  * writes one text file per source (`Base_Whole_Graph.java:80-88,118-162`);
  * a later query re-reads exactly one file. It OOMs at small thresholds
  * because everything is held in one heap until the final flush
  * (Dissertation §5.3).
  *
  * Spark-first shape: fan out over targets (the embarrassingly parallel
  * axis) with the dense kernel per task, one shuffle to source-major via
  * `partitionBy("src")` Parquet write, and Catalyst partition pruning turns
  * the per-source lookup into a single-directory scan. Memory is bounded
  * per task, so the reference's OOM disappears structurally. At 100 TB:
  * targets × nodes >> cluster cores, and the write path streams through
  * the shuffle — no driver materialization anywhere.
  */
object Base {

  /** All-pair PPR: (src, dst, score) where score ≈ π(src, dst), computed by
    * multi-target backward search and inverted to source-major.
    * `scoreThreshold` drops near-zero entries before storing (P1,
    * `Base_Whole_Graph.java:83-87`).
    */
  def allPairs(
      spark: SparkSession,
      edges: DataFrame,
      alpha: Double = 0.15,
      rmax: Double = 1e-4,
      maxSupersteps: Int = 0,
      scoreThreshold: Double = 0.0): DataFrame = {
    val csr = GraphOps.buildCsr(edges)
    val rcsr = GraphOps.buildCsr(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    // forward out-degree in the reversed CSR's dense id space.
    val fwdDeg = Array.tabulate(rcsr.numNodes) { v =>
      val d = csr.denseOf(rcsr.originalOf(v))
      if (d < 0) 0 else csr.outDegree(d)
    }
    val targets = csr.ids.toSeq
    val inverted = BackwardSearch
      .batch(spark, rcsr, fwdDeg, targets, alpha, rmax, maxSupersteps)
      .select(col("node_id").as("src"), col("dst"), col("score"))
    if (scoreThreshold > 0.0) inverted.where(col("score") >= scoreThreshold)
    else inverted
  }

  /** S7 — persist the all-pair table source-major via the shared
    * [[PprStore]] layout (Parquet partitioned by `src`, so a per-source
    * query prunes to one directory).
    */
  def writeStore(allPairs: DataFrame, dir: String): Unit =
    PprStore.write(allPairs.select(col("src"),
      col("dst").as("node_id"), col("score")), dir)

  /** S8 — read one source's PPR vector back; Catalyst partition-prunes the
    * scan to `dir/src=<s>/` (the Spark analogue of the reference's
    * one-file-per-source read, `Base_Whole_Graph.java:167-186`).
    */
  def readSource(spark: SparkSession, dir: String, source: Long): DataFrame =
    PprStore.read(spark, dir, source)

  /** T5 — the all-pair table truncated to each source's tie-inclusive
    * top-k with an EXPLICIT rank column (reference BASE top-k store mode,
    * `Base_Whole_Graph.java:133-155`: kth-value cut, sort desc, write in
    * rank order). The materialized `rk` is what replaces the reference's
    * reliance on file line order (its `getTopKNodeIds` returns
    * `LinkedHashMap` insertion order, `Base_Whole_Graph.java:207-210`) —
    * a Parquet read has no line order, the stored rank IS the order.
    * Ties share a rank (RANK, not ROW_NUMBER), so the cut may exceed k
    * rows exactly like the reference's `>= kth` filter.
    */
  def topkTable(allPairs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("src")).orderBy(col("score").desc)
    allPairs.withColumn("rk", rank().over(w)).where(col("rk") <= k)
  }

  /** S7 (top-k mode) — persist the rank-truncated store source-major;
    * same pruning contract and (src, node_id, score) naming as
    * [[PprStore]], plus the rank column.
    */
  def writeTopkStore(allPairs: DataFrame, dir: String, k: Int): Unit =
    topkTable(allPairs, k)
      .select(col("src"), col("dst").as("node_id"), col("score"), col("rk"))
      .repartition(col("src"))
      .write.mode("overwrite")
      .partitionBy("src")
      .parquet(dir)

  /** S8 (top-k mode) — ordered read-back of one source's pre-truncated
    * vector: rank ascending (node_id tie-break), the reference's
    * insertion-order `getTopKNodeIds` semantics.
    */
  def readTopkSource(spark: SparkSession, dir: String, source: Long): DataFrame =
    spark.read.parquet(dir).where(col("src") === source)
      .select(col("node_id"), col("score"), col("rk"))
      .orderBy(col("rk").asc, col("node_id").asc)

  /** S9 — store size in bytes (reference `getPrepSize`,
    * `Base_Whole_Graph.java:238-244`).
    */
  def storeSize(spark: SparkSession, dir: String): Long =
    PprStore.size(spark, dir)

  /** S9 — recursive delete (reference `deletePrepDir`). */
  def deleteStore(spark: SparkSession, dir: String): Boolean =
    PprStore.delete(spark, dir)

  /** DuckDB oracle: backward-search oracle over ALL nodes as targets,
    * inverted to (src, dst, score) and threshold-filtered.
    */
  def oracleSql(
      graphSql: String,
      alpha: Double,
      rmax: Double,
      supersteps: Int,
      scoreThreshold: Double,
      roundTo: Int = 9): String = {
    val targetsSql =
      s"SELECT DISTINCT id AS t FROM (SELECT src AS id FROM ($graphSql) " +
        s"UNION ALL SELECT dst AS id FROM ($graphSql))"
    val inner = BackwardSearch.oracleSqlMulti(
      graphSql, targetsSql, alpha, rmax, supersteps, roundTo)
    s"SELECT node_id AS src, dst, score FROM ($inner) " +
      s"WHERE score >= $scoreThreshold"
  }
}
