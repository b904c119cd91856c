package graft.queries

/** r20 second-pass width sweep for the PPR-family superstep loop
  * (guide §1/§2.2): the loop's shuffle width comes from a
  * 1M-rows-per-partition floor (p = min(cores, 6m/1e6+1)) that reads
  * p = 3 on the sf0.1 union adjacency (2.7 M rows) — ~0.5 s per
  * superstep with 29 of 32 cores idle. This probe times the FULL
  * family fit at several widths (env override), interleaved.
  *
  * Usage: `GRAFT_FAM_P=<p> ./run.sh graft.queries.FamilyWidthProbe
  * [sfDir] [reps]` — or no env for the shipped formula.
  */
object FamilyWidthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val s = graft.LocalSession.create()
    val pEnv = sys.env.getOrElse("GRAFT_FAM_P", "formula")
    // JIT/page-cache warm pass, untimed.
    Graph.pprFamilyShared(s, dir).count()
    for (r <- 1 to reps) {
      Graph.invalidateModels(s, dir)
      graft.graph.GraphOps.lineitemGraph(s, dir, Graph.Mod).count()
      val t0 = System.nanoTime()
      Graph.pprFamilyShared(s, dir).count()
      println(f"[width] p=$pEnv%-8s rep$r fit ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    s.stop()
  }
}
