package graft.queries

import graft.SparkSpec

/** The dissertation's actual experimental claim, machine-checked: over
  * each family's full GOT ε/rmax axis (Tables 7-26's residue — the
  * charts are precision/NDCG/max-err curves against the accuracy knob),
  * quality must not degrade as the knob tightens. Deterministic family
  * (FWDPUSH) is asserted strictly monotone; the stochastic families
  * (FORA, MC) get a small per-step tolerance — their curves wobble at 5
  * sources × k=10 where one rank swap moves precision by 0.02 — plus a
  * strict endpoint check (tightest point at least as good as the
  * loosest, the claim a chart reader takes away).
  *
  * Values come from the SAME query closures the driver verifies against
  * DuckDB ([[GotQueries.queries]]), so this spec pins the shape of
  * oracle-checked numbers, not a private recomputation.
  */
class GridTrendSpec extends SparkSpec {

  /** Rows of (knob, precision, ndcg, maxErr?) ordered loose → tight. */
  private def rows(name: String): Seq[(Double, Double, Double, Option[Double])] = {
    val out = GotQueries.queries(name)(spark, "ignored").collect()
    val ordered = out.map { r =>
      val knob = r.getDouble(0)
      name match {
        case "got_grid_base" =>
          // schema: thres, stored_rows, precision, ndcg, max_err
          (knob, r.getDouble(2), r.getDouble(3), Some(r.getDouble(4)))
        case "got_grid_fora" | "got_grid_mc" | "got_grid_fwdpush" =>
          (knob, r.getDouble(1), r.getDouble(2), Some(r.getDouble(3)))
        case _ => // top-k rows: knob, precision, ndcg
          (knob, r.getDouble(1), r.getDouble(2), None)
      }
    }
    // every knob here means "smaller = more accurate"
    ordered.sortBy(-_._1).toSeq
  }

  private def checkTrend(name: String, rs: Seq[(Double, Double, Double, Option[Double])],
      stepTol: Double): Unit = {
    info(s"$name: " + rs.map { case (k, p, n, e) =>
      f"$k%g → p=$p%.3f n=$n%.3f" + e.map(v => f" err=$v%.2e").getOrElse("")
    }.mkString(" | "))
    rs.sliding(2).foreach {
      case Seq((k0, p0, n0, e0), (k1, p1, n1, e1)) =>
        assert(p1 >= p0 - stepTol, s"$name precision dropped $p0 -> $p1 at $k0 -> $k1")
        assert(n1 >= n0 - stepTol, s"$name ndcg dropped $n0 -> $n1 at $k0 -> $k1")
        (e0, e1) match {
          case (Some(a), Some(b)) =>
            // max-err is the noisiest metric: allow a small relative +
            // absolute wobble per step for stochastic families
            // (stepTol = 0 demands strict non-increase).
            assert(b <= a * (1.0 + 10 * stepTol) + stepTol * 1e-3,
              s"$name max_err rose $a -> $b at $k0 -> $k1")
          case _ => ()
        }
      case _ => ()
    }
    // endpoints strict: the tightest knob is at least as good as the loosest.
    val (_, pL, nL, eL) = rs.head
    val (_, pT, nT, eT) = rs.last
    assert(pT >= pL, s"$name endpoint precision $pL -> $pT")
    assert(nT >= nL, s"$name endpoint ndcg $nL -> $nT")
    for (a <- eL; b <- eT) assert(b <= a, s"$name endpoint max_err $a -> $b")
  }

  test("FWDPUSH quality is strictly non-degrading as rmax tightens") {
    checkTrend("got_grid_fwdpush", rows("got_grid_fwdpush"), stepTol = 0.0)
    checkTrend("got_grid_topk", rows("got_grid_topk"), stepTol = 0.0)
  }

  test("BASE quality is non-degrading as the store threshold tightens") {
    checkTrend("got_grid_base", rows("got_grid_base"), stepTol = 0.0)
  }

  test("FORA quality trends upward over the full ε axis") {
    checkTrend("got_grid_fora", rows("got_grid_fora"), stepTol = 0.05)
    checkTrend("got_grid_fora_topk", rows("got_grid_fora_topk"), stepTol = 0.05)
  }

  test("MC quality trends upward over the full ε axis") {
    checkTrend("got_grid_mc", rows("got_grid_mc"), stepTol = 0.05)
    checkTrend("got_grid_mc_topk", rows("got_grid_mc_topk"), stepTol = 0.05)
  }

  /** LIBRARY (GraphX) is the one family whose grid evidence lives in the
    * committed golden log rather than an oracle-checked query row (its
    * reproduction is FullGridSpec's byte-for-byte check). Its knob is an
    * iteration COUNT — more iterations must not degrade quality. Parsed
    * straight from the golden, so the asserted numbers are exactly the
    * ones the slow spec proves the engine reproduces.
    */
  test("LIBRARY quality is non-degrading as iterations grow (golden rows)") {
    val lines = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/got_full_golden.txt")).getLines().toSeq
    def section(tag: String): Seq[Array[String]] = {
      val from = lines.indexWhere(_.endsWith(tag))
      assert(from >= 0, s"golden section $tag missing")
      lines.drop(from + 1).takeWhile(_.trim.nonEmpty).map(_.split(","))
    }
    // Test 1 whole-graph: iters, T, max_err — err non-increasing
    val wg = section("1.3 LIBRARY").map(c => (c(0).toInt, c(2).toDouble))
    assert(wg.map(_._1) == wg.map(_._1).sorted && wg.size >= 5)
    wg.sliding(2).foreach {
      case Seq((i0, e0), (i1, e1)) =>
        assert(e1 <= e0, s"whole-graph max_err rose $e0 -> $e1 at $i0 -> $i1")
      case _ => ()
    }
    // Test 2 top-k: iters, k, T, precision, ndcg — both non-decreasing
    val tk = section("2.3 LIBRARY")
      .map(c => (c(0).toInt, c(3).toDouble, c(4).toDouble))
    tk.sliding(2).foreach {
      case Seq((i0, p0, n0), (i1, p1, n1)) =>
        assert(p1 >= p0, s"top-k precision dropped $p0 -> $p1 at $i0 -> $i1")
        assert(n1 >= n0, s"top-k ndcg dropped $n0 -> $n1 at $i0 -> $i1")
      case _ => ()
    }
    // Test 3 prep: iters, -1.0, T, B, max_err — err non-increasing
    val pr = section("3.3 LIBRARY").map(c => (c(0).toInt, c(4).toDouble))
    pr.sliding(2).foreach {
      case Seq((i0, e0), (i1, e1)) =>
        assert(e1 <= e0, s"prep max_err rose $e0 -> $e1 at $i0 -> $i1")
      case _ => ()
    }
  }
}
