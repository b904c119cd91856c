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
      // phase split of the fora_topk row: kernel fan-out + 3 writes,
      // then read-back + per-i est recomposition, then the tagged fold
      val root = graft.VerifyArtifacts.dir(s, "fora_probe")
      t("ftk artifact writes (fan-out + 3)") {
        Graph.foraArtifactsMulti(s, csr, GotQueries.GridSources, root,
          GotQueries.GridForaTopkEpsilons.map { eps =>
            (g: graft.graph.Csr, src: Long) =>
              val tr = graft.ppr.Fora.topkTrace(g, g.denseOf(src),
                GotQueries.GridK,
                graft.ppr.Fora.Conf(alpha = Got.Alpha, epsilon = eps))
              (tr.reserve, tr.residue, 0.0, tr.numWalks, tr.walks)
          })
      }
      val est = t("ftk est recomposition + ckpt") {
        import org.apache.spark.sql.functions.{col, lit}
        val st = s.read.parquet(s"$root/st")
        val sc = s.read.parquet(s"$root/sc")
        val wk = s.read.parquet(s"$root/wk")
        GotQueries.GridForaTopkEpsilons.indices.map { i =>
          st.where(col("i") === i).drop("i")
            .createOrReplaceTempView(s"pr_ftk_st_$i")
          sc.where(col("i") === i).drop("i")
            .createOrReplaceTempView(s"pr_ftk_sc_$i")
          wk.where(col("i") === i).drop("i")
            .createOrReplaceTempView(s"pr_ftk_wk_$i")
          s.sql(Graph.foraTopkBody(s"pr_ftk_st_$i", s"pr_ftk_sc_$i",
              s"pr_ftk_wk_$i", k = GotQueries.GridK))
            .withColumn("i", lit(i))
        }.reduce(_.unionAll(_)).localCheckpoint(true)
      }
      t("ftk tagged metric fold") {
        noop(graft.ppr.Metrics.topkQualityTagged(
          GotQueries.gridGroundTruth(s), est, GotQueries.GridK,
          GotQueries.GridForaTopkEpsilons.indices))
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
      // base phase split: all-pair ckpt, S7 partitioned store write,
      // S8 read-back + est0 ckpt, stored_rows agg + tagged fold
      locally {
        import org.apache.spark.sql.functions.{col, round => rnd}
        val ap = t("base allPairs + ckpt") {
          graft.ppr.Base.allPairs(s, Got.edges(s), Got.Alpha,
              GotQueries.GridBaseRmax, GotQueries.GridSupersteps)
            .select(col("src"), col("dst"), rnd(col("score"), 9).as("score"))
            .localCheckpoint(true)
        }
        val dir = graft.Scratch.dir(s, "got_base_probe/all")
        t("base S7 store write (107 parts)") {
          graft.ppr.Base.writeStore(
            ap.where(col("score") >= GotQueries.GridBaseThresholds.min), dir)
        }
        val store = s.read.parquet(dir)
        t("base S8 read + est0 ckpt") {
          store.where(col("src").isin(GotQueries.GridSources: _*))
            .select(col("src").cast("long").as("src"), col("node_id"),
              col("score"))
            .localCheckpoint(true)
            .count()
        }
        t("base stored_rows one-pass agg") {
          noop(store.agg(
            org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.when(
                col("score") >= GotQueries.GridBaseThresholds.head, 1L))))
        }
      }
      t("got_grid_fora FULL row") {
        GotQueries.queries("got_grid_fora")(s, "").count()
      }
    }
    s.stop()
  }
}
