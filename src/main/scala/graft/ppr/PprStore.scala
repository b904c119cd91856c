package graft.ppr

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7-S9 — the generic per-source PPR store, shared by EVERY algorithm
  * family (reference: each algo re-implements the same one-file-per-source
  * sink/scan/size/delete quartet — `Forward_Push.java:320-362`,
  * `Monte_Carlo.java:212-254`, `Neo4j_Method.java:157-216`,
  * `Base_Whole_Graph.java:118-186,238-251`; here it is one Parquet layout).
  *
  * Layout: Parquet partitioned by `src`, so a per-source query is a
  * Catalyst partition-pruned scan of exactly one directory — the Spark
  * analogue of opening one `<srcId>.txt`. At 100 TB the write streams
  * through one shuffle (repartition by src) with no driver
  * materialization, and reads touch only the queried source's files.
  */
object PprStore {

  /** S7 — persist `(src, node_id, score)` source-major. */
  def write(scores: DataFrame, dir: String): Unit =
    scores
      .select(col("src"), col("node_id"), col("score"))
      .repartition(col("src"))
      .write.mode("overwrite")
      .partitionBy("src")
      .parquet(dir)

  /** S8 — one source's vector back: `(node_id, score)`, partition-pruned. */
  def read(spark: SparkSession, dir: String, source: Long): DataFrame =
    spark.read.parquet(dir).where(col("src") === source)
      .select(col("node_id"), col("score"))

  /** S9 — store size in bytes (0 when absent). */
  def size(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** S9 — recursive delete; false when nothing existed. */
  def delete(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}
