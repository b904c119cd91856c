package graft.queries

import org.apache.spark.sql.functions._

/** r20 second-pass attribution probe (guide §1) for the two heaviest
  * fit-bearing rows left on the board: `g_hits` (pays the 5-member
  * PPR-family fit) and `e_nsw_recall` (pays the NN-descent index
  * build). Phases print separately so any further change targets the
  * real cost — and a "left alone" verdict carries numbers.
  *
  * Usage: `./run.sh graft.queries.FamilyProbe [sfDir] [reps]`
  */
object FamilyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val s = graft.LocalSession.create()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fam] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      Graph.invalidateModels(s, dir)
      Embeddings.invalidateModels(s, dir)
      val e = t("lineitemGraph(Mod) fit") {
        graft.graph.GraphOps.lineitemGraph(s, dir, Graph.Mod)
      }
      // ---- family setup replication (everything before the loop) ----
      t("family setup replication (to nodes.count)") {
        val ep = e.persist()
        val deg = graft.graph.GraphOps.outDegrees(ep)
        val m = ep.count()
        val weightedP = ep.join(deg, ep("src") === deg("id"))
          .select(ep("src"), ep("dst"), (lit(1.0) / col("deg")).as("w"))
        val ew0 = weightedP.union(
            ep.select(col("src"), col("dst"), lit(1.0).as("w")))
          .localCheckpoint(true)
        ew0.count(): Unit
        ep.unpersist(false)
        println(s"[fam]   m = $m")
      }
      t("pprFamilyShared FULL fit (loop + setup)") {
        Graph.pprFamilyShared(s, dir).count()
      }
      t("g_hits slice (warm family)") {
        Graph.queries("g_hits")(s, dir).count()
      }
      t("g_pagerank slice (warm family)") {
        Graph.queries("g_pagerank")(s, dir).count()
      }
      // ---- NSW: build vs shared frames vs beam sweep ----
      t("nswGraphBuild (5 NN-descent rounds)") {
        Embeddings.nswGraph(s, dir).count()
      }
      t("e_nsw_recall row (warm graph)") {
        Embeddings.queries("e_nsw_recall")(s, dir).count()
      }
      t("e_nsw_search row (warm everything)") {
        Embeddings.queries("e_nsw_search")(s, dir).count()
      }
    }
    s.stop()
  }
}
