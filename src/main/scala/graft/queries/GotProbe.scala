package graft.queries

import graft.graph.Got

/** r20 attribution side-bench (guide §1.4): where do the got_grid rows'
  * seconds sit — kernel compute, artifact write, or read-back + metric
  * fold? The GOT graph is 107 nodes, so the kernels are microseconds;
  * this probe times each phase of the two heaviest rows in isolation
  * (noop sink for the fold phase) so the optimization targets the real
  * cost. Not a query path — never registered in SparkEntry.
  *
  * Usage: `./run.sh graft.queries.GotProbe [reps]`
  */
object GotProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val s = graft.LocalSession.create()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val csr = t("csr build")(Got.cachedCsr(s))
    t("ground truth (memoized after 1st)") {
      GotQueries.queries("got_grid_seedset")(s, "")
        .count()
    }

    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      // got_grid_fora_topk phases
      t("ftk kernel only (25 traces, local)") {
        for (eps <- GotQueries.GridForaTopkEpsilons;
             src <- GotQueries.GridSources if csr.denseOf(src) >= 0)
          graft.ppr.Fora.topkTrace(csr, csr.denseOf(src), GotQueries.GridK,
            graft.ppr.Fora.Conf(alpha = Got.Alpha, epsilon = eps))
      }
      t("got_grid_fora_topk FULL row") {
        GotQueries.queries("got_grid_fora_topk")(s, "").count()
      }
      // got_grid_mc phases
      t("mc kernel+write (endpoint table)") {
        val wdir = graft.VerifyArtifacts.dir(s, "mc_probe")
        graft.ppr.MonteCarlo.sspprEndpoints(s, csr, GotQueries.GridSources,
            Got.Alpha, epsilon = GotQueries.GridMcEpsilons.min)
          .write.mode("overwrite").parquet(wdir)
      }
      t("mc kernel noop (no write)") {
        noop(graft.ppr.MonteCarlo.sspprEndpoints(s, csr,
          GotQueries.GridSources, Got.Alpha,
          epsilon = GotQueries.GridMcEpsilons.min))
      }
      t("got_grid_mc FULL row") {
        GotQueries.queries("got_grid_mc")(s, "").count()
      }
      // got_grid_base phases
      t("base allPairs kernel noop") {
        noop(graft.ppr.Base.allPairs(s, Got.edges(s), Got.Alpha,
          GotQueries.GridBaseRmax, GotQueries.GridSupersteps))
      }
      t("got_grid_base FULL row") {
        GotQueries.queries("got_grid_base")(s, "").count()
      }
      t("got_grid_fora FULL row") {
        GotQueries.queries("got_grid_fora")(s, "").count()
      }
    }
    s.stop()
  }
}
