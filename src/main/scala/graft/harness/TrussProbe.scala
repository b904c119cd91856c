package graft.harness

import org.apache.spark.sql.functions._

/** Truss-section micro-probe for the Flickr-scale octave — the
  * warm-compare discipline applied to the one OctaveBench section too
  * heavy to read off a single full-board pass (the r17 floor/bookkeeping
  * work measured 56–98 s across same-day octave boards while every
  * OTHER section sat within ±20 %). Runs the octave's exact K=4 peel
  * `GRAFT_PROBE_N` times in one warm JVM and prints one JSON line per
  * pass with the wall time and the disclosed regimes — medians across
  * passes are the comparable number.
  */
object TrussProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("GRAFT_PROBE_N", "3").toInt
    val spark = graft.LocalSession.create()
    val edges = graft.graph.GraphOps.lineitemFlickrGraph(spark, sfDir)
      .localCheckpoint(true)
    val und = edges.where(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .localCheckpoint(true)
    und.count()
    val sc = spark.sparkContext
    for (i <- 1 to n) {
      val pinnedBefore = sc.getPersistentRDDs.keySet
      // the measured body IS OctaveBench's truss section — one source of
      // truth for the committed octave number (r17 verdict #6).
      val (cnt, dt, _, regimes) = OctaveBench.trussSection(spark, und,
        sys.env.getOrElse("GRAFT_TRUSS_K", "4").toInt,
        sys.env.getOrElse("GRAFT_TRUSS_ROUNDS", "64").toInt)
      val now = sc.getPersistentRDDs
      (now.keySet -- pinnedBefore)
        .foreach(id => now.get(id).foreach(_.unpersist(false)))
      println(s"""{"pass":$i,"sec":${Fmt.r1(dt)},"edges":$cnt,""" +
        s""""regimes":"${regimes.mkString(",")}"}""")
    }
    spark.stop()
  }
}
