package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = LocalSession.create()
    new java.io.File(outDir).mkdirs()
    // optional comma-separated subset for local iteration (same contract as
    // Bench); the driver never sets it, so driver runs dump everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    val sc = spark.sparkContext
    // Self-contained dump, symmetric with Bench.runBoard (r19 verdict
    // #1): drop any session fit a previous in-JVM caller left behind so
    // every verify pass recomputes from the parquet inputs.
    graft.queries.Embeddings.invalidateModels(spark, sfDir)
    selected.foreach { case (name, fn) =>
      val pinnedBefore = sc.getPersistentRDDs.keySet
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // result written — release anything this query pinned (same
      // session-hygiene rationale as Bench), sparing session-scoped
      // model caches (SessionPins: the fitted-once PQ codebooks).
      val now = sc.getPersistentRDDs
      (now.keySet -- pinnedBefore -- graft.operators.SessionPins.pinned(sc))
        .foreach(id => now.get(id).foreach(_.unpersist(false)))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
