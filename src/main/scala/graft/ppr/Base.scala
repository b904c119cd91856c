package graft.ppr

import org.apache.hadoop.fs.Path
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

  /** S7 — persist the all-pair table source-major: Parquet partitioned by
    * `src`, so a per-source query prunes to one directory.
    */
  def writeStore(allPairs: DataFrame, dir: String): Unit =
    allPairs
      .repartition(col("src"))
      .write.mode("overwrite")
      .partitionBy("src")
      .parquet(dir)

  /** S8 — read one source's PPR vector back; Catalyst partition-prunes the
    * scan to `dir/src=<s>/` (the Spark analogue of the reference's
    * one-file-per-source read, `Base_Whole_Graph.java:167-186`).
    */
  def readSource(spark: SparkSession, dir: String, source: Long): DataFrame =
    spark.read.parquet(dir).where(col("src") === source)
      .select(col("dst").as("node_id"), col("score"))

  /** S9 — store size in bytes (reference `getPrepSize`,
    * `Base_Whole_Graph.java:238-244`).
    */
  def storeSize(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** S9 — recursive delete (reference `deletePrepDir`). */
  def deleteStore(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

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
