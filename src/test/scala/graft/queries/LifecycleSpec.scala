package graft.queries

import graft.SparkSpec

/** `ev_churn` / `ev_seasonality` / `ev_bitmap_retention` — brute-force
  * replays of the lifecycle ledger, the seasonality heatmap, and the
  * bitmask retention curve from the raw (user, timestamp) stream.
  */
class LifecycleSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val raw: Array[(Long, Long)] =
    graft.Tables(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("ev_churn matches brute force and the ledger reconciles: " +
      "active = new + retained + resurrected, churn = prev active - retained") {
    val got = Events.queries("ev_churn")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap

    val uw = raw.map { case (u, us) =>
      (u, Math.floorDiv(us, Events.WeekUs))
    }.distinct
    val byUser = uw.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val first = byUser.view.mapValues(_.min).toMap
    val weeks = uw.map(_._2).distinct.sorted
    val want = weeks.map { w =>
      val act = byUser.count { case (_, ws) => ws(w) }
      val nw = first.values.count(_ == w)
      val rt = byUser.count { case (_, ws) => ws(w) && ws(w - 1) }
      val rs = byUser.count { case (u, ws) =>
        ws(w) && !ws(w - 1) && w > first(u)
      }
      val ch = byUser.count { case (_, ws) => ws(w - 1) && !ws(w) }
      w -> ((act.toLong, nw.toLong, rt.toLong, rs.toLong, ch.toLong))
    }.toMap
    assert(got == want)
    // ledger identities
    got.foreach { case (w, (act, nw, rt, rs, ch)) =>
      assert(act == nw + rt + rs, s"week $w split")
      val prevAct = got.get(w - 1).map(_._1).getOrElse(0L)
      assert(ch == prevAct - rt, s"week $w churn")
    }
    assert(got.nonEmpty && got(weeks.head)._2 == got(weeks.head)._1,
      "first week is all-new")
  }

  test("ev_seasonality matches brute force and shares sum to 1") {
    val got = Events.queries("ev_seasonality")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

    val cells = raw.groupBy { case (_, us) =>
      (Math.floorDiv(us, Events.DayUs) % 7,
        Math.floorMod(us, Events.DayUs) / Events.HourUs)
    }
    val total = raw.length.toDouble
    val want = cells.map { case (k, es) =>
      k -> ((es.length.toLong, es.map(_._1).distinct.length.toLong,
        round6(es.length.toDouble / total)))
    }
    assert(got == want)
    assert(got.keySet.forall { case (d, h) =>
      d >= 0 && d < 7 && h >= 0 && h < 24
    })
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-3)
  }

  test("ev_bitmap_retention matches brute force; day 0 is the full cohort") {
    val got = Events.queries("ev_bitmap_retention")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap

    val ud = raw.map { case (u, us) =>
      (u, Math.floorDiv(us, Events.DayUs))
    }.distinct
    val byUser = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nCohort = byUser.size.toLong
    val want = (0 until Events.RetentionBitDays).flatMap { k =>
      val n = byUser.count { case (_, ds) => ds.contains(ds.min + k) }
      if (n == 0) None
      else Some(k -> ((n.toLong, nCohort, round6(n.toDouble / nCohort))))
    }.toMap
    assert(got == want)
    assert(got(0) == ((nCohort, nCohort, 1.0)), "offset 0 is everyone")
    got.foreach { case (k, (n, c, r)) =>
      assert(k >= 0 && k < Events.RetentionBitDays && n <= c &&
        r == round6(n.toDouble / c))
    }
  }
}
