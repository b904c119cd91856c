package graft.harness

import org.apache.spark.sql.functions._
import graft.graph.{GraphOps, Hits}
import graft.queries.{Graph => GQ}

/** Scale evidence for the round-10 graph additions on the EDGE-HEAVY
  * octave: k-core peeling, HITS, and HyperBall on the Flickr-scale
  * hub-skew synthetic ([[GraphOps.lineitemFlickrGraph]]: ~80.5k nodes /
  * ~11.9M directed edges, ~18.6k-degree hubs) — the regime where a
  * kernel with the wrong shuffle shape stops scaling. The correctness
  * rows pin these kernels on ≤ 600k-edge graphs; this main measures the
  * same bodies (`kcoreRun` / `Hits.run` / `hyperBallRun`, no forked
  * variants) at 20× the edge count and prints ONE JSON line, committed
  * as `BENCH_OCTAVE.json` and quoted in SURVEY §6's round log.
  *
  * K for the peel sits at the power-law tail (~100): K = 64 fixpoints on
  * round 1 (everything survives), K = 150 — above the ~148 mean degree —
  * cascades to the EMPTY core within the horizon (the classic k-core
  * unraveling transition), and K = 100 leaves the strict nontrivial
  * 76,877-node core the measurement wants.
  */
object OctaveBench {

  import Fmt.r1

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.create()

    val edges = GraphOps.lineitemFlickrGraph(spark, sfDir).localCheckpoint(true)
    val m = edges.count()
    val und = edges.where(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .localCheckpoint(true) // the graph is symmetric: src<dst IS a<b dedup
    val n = edges.select(col("src")).distinct().count()

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val out = body
      (out, (System.nanoTime() - t0) / 1e9)
    }

    val kcoreK = sys.env.getOrElse("GRAFT_KCORE_K", "100").toInt
    val (core, kcoreSec) = timed {
      GQ.kcoreRun(und, kcoreK, GQ.KcoreRounds).collect()
    }

    val (hitsTop, hitsSec) = timed {
      Hits.run(spark, edges, GQ.HitsIters)
        .orderBy(col("hub").desc, col("node_id")).limit(1).collect()(0)
    }

    val (hb, hbSec) = timed {
      GQ.hyperBallRun(edges)
        .agg(avg(col("est2")).as("mean2"), avg(col("est1")).as("mean1"))
        .collect()(0)
    }

    // LPA + Newman-Q moments (the g_modularity body): per LPA round one
    // map-side-combined groupBy + WindowGroupLimit argmax over ~12M
    // candidate rows — the shuffle shape under test at hub skew.
    val (mod, modSec) = timed {
      GQ.modularityRun(spark, edges, GQ.LpRounds).collect()(0)
    }

    println(s"""{"metric":"octave_ops","sf":"$sfDir"""" +
      s""","fli_nodes":$n,"fli_edges":$m""" +
      s""","kcore_sec":${r1(kcoreSec)},"kcore_k":$kcoreK""" +
      s""","kcore_rounds":${GQ.KcoreRounds},"kcore_core_nodes":${core.length}""" +
      s""","hits_sec":${r1(hitsSec)},"hits_iters":${GQ.HitsIters}""" +
      s""","hits_top_hub":${hitsTop.getLong(0)}""" +
      s""","hyperball_sec":${r1(hbSec)}""" +
      s""","hyperball_mean_est1":${r1(hb.getDouble(1))}""" +
      s""","hyperball_mean_est2":${r1(hb.getDouble(0))}""" +
      s""","modularity_sec":${r1(modSec)},"lpa_rounds":${GQ.LpRounds}""" +
      s""","modularity_q":${mod.getDouble(3)}}""")
    spark.stop()
  }
}
