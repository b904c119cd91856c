package graft.queries

import org.apache.spark.sql.functions._

/** r20 attribution probe for the two remaining heavy graph rows
  * (guide §1.4): `g_adamic_adar`'s lpShared wedge fold (the board's #2
  * fit after the harness honesty fix) and `g_walk_corpus`'s
  * positioned-adjacency + 6-step loop (r19 verdict #8). Phases print
  * separately so the optimization targets the real cost.
  *
  * Usage: `./run.sh graft.queries.WedgeWalkProbe [sfDir] [reps]`
  */
object WedgeWalkProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val s = graft.LocalSession.create()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      // ---- lpShared (wedgePairAgg) phases over the TriMod graph ----
      val und = t("und snapshot (served)") {
        graft.graph.GraphOps.lineitemUndirected(s, dir, Graph.TriMod)
      }
      val adj = und.select(col("a").as("w"), col("b").as("n"))
        .unionAll(und.select(col("b").as("w"), col("a").as("n")))
      val deg = t("deg fold + ckpt") {
        adj.groupBy(col("w")).agg(count(lit(1)).as("dg"))
          .localCheckpoint(true)
      }
      val capped = t("capped adj ckpt") {
        adj.join(deg.where(col("dg").between(2, Graph.LpCnDegCap)), Seq("w"))
          .select(col("w"), col("n"),
            round(lit(1e6) / log(col("dg"))).cast("long").as("wt"))
          .localCheckpoint(true)
      }
      def wedgeAgg = capped.as("x").join(capped.as("y"),
          col("x.w") === col("y.w") && col("x.n") < col("y.n"))
        .select((shiftleft(col("x.n"), 32) + col("y.n")).as("uv"),
          col("x.wt"))
        .groupBy(col("uv"))
        .agg(count(lit(1)).as("cn"), sum(col("wt")).as("aa_fp"))
      t("wedge self-join + pair agg (noop)") { noop(wedgeAgg) }
      for (p <- Seq(64, 128)) {
        val s2 = capped.sparkSession
        val prev = s2.conf.get("spark.sql.shuffle.partitions")
        try {
          s2.conf.set("spark.sql.shuffle.partitions", p.toString)
          t(s"wedge agg noop @ $p partitions") { noop(wedgeAgg) }
        } finally s2.conf.set("spark.sql.shuffle.partitions", prev)
      }
      t("wedge rows (count of join output)") {
        println("[probe]   wedges = " + capped.as("x").join(capped.as("y"),
          col("x.w") === col("y.w") && col("x.n") < col("y.n")).count())
      }
      if (r == 1) {
        println("[probe] ---- wedgePairAgg physical plan ----")
        Graph.wedgePairAgg(und, deg, Graph.LpCnDegCap).explain("formatted")
      }
      t("g_adamic_adar FULL row (uncached)") {
        Graph.invalidateModels(s, dir)
        Graph.queries("g_adamic_adar")(s, dir).count()
      }
      // ---- g_walk_corpus phases ----
      val e = graft.graph.GraphOps.lineitemGraph(s, dir, Graph.TriMod)
      val wadj = t("walkAdj window + ckpt") { Graph.walkAdj(e) }
      t("walk 6-step loop + union (noop)") {
        noop(Graph.walkCorpus(wadj, Graph.WalkSrcMod, Graph.WalksPerSrc,
          Graph.WalkLen, broadcastState = true))
      }
      t("g_walk_corpus FULL row") {
        Graph.queries("g_walk_corpus")(s, dir).count()
      }
    }
    s.stop()
  }
}
