package graft.queries

import graft.SparkSpec

class EventsSpec extends SparkSpec {

  test("ev_asof: latest click at-or-before each purchase, ties inclusive") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evasof").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: purchase before any click (null as-of), then a same-second
    // click+purchase tie (click must count — inclusive <= semantics);
    // user 2: two clicks around two purchases, plus a 'view' that must be
    // ignored by the click/purchase filter.
    Seq(
      (10L, ts(5), 1L, "purchase", 1.0, "{}"),
      (11L, ts(10), 1L, "click", 0.0, "{}"),
      (12L, ts(10), 1L, "purchase", 2.0, "{}"),
      (20L, ts(100), 2L, "click", 0.0, "{}"),
      (21L, ts(150), 2L, "view", 0.0, "{}"),
      (22L, ts(160), 2L, "purchase", 3.0, "{}"),
      (23L, ts(200), 2L, "click", 0.0, "{}"),
      (24L, ts(250), 2L, "purchase", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = Events.queries("ev_asof")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3))), r.getLong(4)))
      .toMap
    def us(sec: Long) = sec * 1000000L
    assert(got(10L) == ((None, 0L)), "purchase before any click")
    assert(got(12L) == ((Some(us(10)), 1L)), "same-timestamp click included")
    assert(got(22L) == ((Some(us(100)), 1L)), "strictly-preceding click")
    assert(got(24L) == ((Some(us(200)), 2L)), "latest of two clicks + count")
    assert(got.keySet == Set(10L, 12L, 22L, 24L), "one row per purchase only")
  }

  test("ev_attrib_linear: equal micro-cent split across in-window " +
      "clicks, div-floor remainder, exact integer folds") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evattr").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val W = Events.AttrWindowSec
    // user 1: purchase of 1.00 (100 cents) with THREE in-window clicks —
    // 1,000,000 µ¢ div 3 = 333,333 each (remainder 1 dropped by contract);
    // one click sits exactly at p_ts - W (EXCLUDED: window is open on the
    // left) and one exactly at p_ts (included). user 2: two purchases
    // sharing one click (credits add), plus an out-of-window click.
    Seq(
      (1L, ts(1000L - W), 1L, "click", 0.0, "{}"), // exactly -W: excluded
      (2L, ts(900), 1L, "click", 0.0, "{}"),
      (3L, ts(950), 1L, "click", 0.0, "{}"),
      (4L, ts(1000), 1L, "click", 0.0, "{}"), // exactly at p_ts: included
      (5L, ts(1000), 1L, "purchase", 1.0, "{}"),
      (10L, ts(5000), 2L, "click", 0.0, "{}"),
      (11L, ts(5100), 2L, "purchase", 2.0, "{}"),
      (12L, ts(5200), 2L, "purchase", 0.5, "{}"),
      (13L, ts(500000), 2L, "click", 0.0, "{}")) // far future: no credit
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = Events.queries("ev_attrib_linear")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      2L -> ((1L, 333333L)), 3L -> ((1L, 333333L)), 4L -> ((1L, 333333L)),
      10L -> ((2L, 2000000L + 500000L))))
  }

  test("ev_rfm replays a brute-force sampled-tercile scorer exactly") {
    import graft.text.TextOps
    val got = Events.queries("ev_rfm")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))).toMap
    val purch = graft.Tables(spark, sfDir, "events")
      .where(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("user_id", "unix_micros(ts)",
        "CAST(round(value * 100) AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gmax = purch.map(_._2).max
    val dayUs = Events.DayUs
    val rfm = purch.groupBy(_._1).map { case (u, es) =>
      (u, (gmax - es.map(_._2).max) / dayUs, es.length.toLong,
        es.map(_._3).sum)
    }.toArray
    assert(got.keySet == rfm.map(_._1).toSet)
    val sample = rfm.map(t => (TextOps.kmvMix(t._1 % TextOps.P), t))
      .sortBy(p => (p._1, p._2._1)).take(Events.RfmSampleK).map(_._2)
    val k = sample.length
    def thr(metric: ((Long, Long, Long, Long)) => Long): (Long, Long) = {
      val sorted = sample.sortBy(t => (metric(t), t._1)).map(metric)
      (sorted(((k - 1) / 3.0).floor.toInt), sorted((((k - 1) * 2.0) / 3.0)
        .floor.toInt))
    }
    val (rLo, rHi) = thr(_._2)
    val (fLo, fHi) = thr(_._3)
    val (mLo, mHi) = thr(_._4)
    rfm.foreach { case (u, r, f, m) =>
      val rs = if (r <= rLo) 3 else if (r > rHi) 1 else 2
      val fs = if (f <= fLo) 1 else if (f > fHi) 3 else 2
      val ms = if (m <= mLo) 1 else if (m > mHi) 3 else 2
      assert(got(u) == ((r, f, m, rs, fs, ms, rs * 100 + fs * 10 + ms)),
        s"user $u")
    }
  }

  test("ev_latest: one row per (user, type), it is the max-(ts, id) " +
      "event, and the cut compiles to WindowGroupLimit") {
    val df = Events.queries("ev_latest")(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3)))).toMap
    val all = graft.Tables(spark, sfDir, "events")
      .selectExpr("user_id", "event_type", "event_id", "unix_micros(ts)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val want = all.groupBy(t => (t._1, t._2)).view.mapValues(
      _.maxBy(t => (t._4, t._3))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (_, _, id, us)) =>
      assert(got(k) == ((id, us)), s"group $k")
    }
    assert(df.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"), "map-side group limit missing")
  }

  test("ev_ewma replays the recurrence exactly on the bench table and " +
      "seeds each type's series with its first daily value") {
    val got = Events.queries("ev_ewma")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      var e = 0.0
      sorted.zipWithIndex.foreach { case ((_, _, x, gotE), i) =>
        e = if (i == 0) x
        else Events.EwmaAlpha * x + Events.EwmaOneMinusAlpha * e
        assert(gotE == graft.text.TextOps.round6(e))
        // smoothing stays inside the running min/max envelope
        val hist = sorted.take(i + 1).map(_._3)
        assert(e >= hist.min - 1e-9 && e <= hist.max + 1e-9)
      }
    }
  }

  test("ev_holt replays the level/trend recurrence exactly, seeds " +
      "(l=x1, b=0), and tracks a linear ramp with zero lag") {
    val got = Events.queries("ev_holt")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      var l = 0.0
      var b = 0.0
      sorted.zipWithIndex.foreach {
        case ((_, _, x, gl, gb, gf), i) =>
          if (i == 0) { l = x; b = 0.0 }
          else {
            val lp = l
            l = Events.HoltAlpha * x + Events.HoltOneMinusAlpha * (lp + b)
            b = Events.HoltBeta * (l - lp) + Events.HoltOneMinusBeta * b
          }
          assert(gl == graft.text.TextOps.round6(l))
          assert(gb == graft.text.TextOps.round6(b))
          assert(gf == graft.text.TextOps.round6(l + b))
      }
    }
    // the property EWMA lacks: on a pure linear ramp the trend term
    // converges to the slope and the one-step forecast becomes exact.
    var l = 10.0
    var b = 0.0
    (2 to 60).foreach { t =>
      val x = 10.0 * t
      val lp = l
      l = Events.HoltAlpha * x + Events.HoltOneMinusAlpha * (lp + b)
      b = Events.HoltBeta * (l - lp) + Events.HoltOneMinusBeta * b
    }
    assert(math.abs(b - 10.0) < 1e-6, s"trend $b missed the slope")
    assert(math.abs((l + b) - 10.0 * 61) < 1e-5, "forecast lags the ramp")
  }

  test("ev_holt_winters replays the triple recurrence exactly (first " +
      "season consumed as seed), and locks onto a periodic+trend signal") {
    val got = Events.queries("ev_holt_winters")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty)
    val P = Events.HwPeriod
    got.groupBy(_._1).foreach { case (typ, rows) =>
      // rebuild the daily series from the batch ev_holt row (same
      // exact-cents daily column, all days incl. the seed prefix)
      val series = Events.queries("ev_holt")(spark, sfDir).collect()
        .collect { case r if r.getString(0) == typ =>
          (r.getLong(1), r.getDouble(2)) }.sortBy(_._1)
      assert(series.length >= P + 1)
      var acc = 0.0
      (0 until P).foreach(i => acc += series(i)._2)
      val l0 = acc / P
      var seas = Vector.tabulate(P)(j => series(j)._2 - l0)
      var l = l0
      var b = 0.0
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == series.drop(P).map(_._1).toSeq,
        "emitted days must be exactly the post-seed suffix")
      sorted.zip(series.drop(P)).foreach {
        case ((_, _, gd, gl, gb, gs, gf), (_, x)) =>
          val sP = seas.head
          val lp = l
          l = Events.HwAlpha * (x - sP) +
            Events.HwOneMinusAlpha * (lp + b)
          b = Events.HwBeta * (l - lp) + Events.HwOneMinusBeta * b
          val sNew = Events.HwGamma * (x - l) +
            Events.HwOneMinusGamma * sP
          seas = seas.tail :+ sNew
          assert(gd == x)
          assert(gl == graft.text.TextOps.round6(l))
          assert(gb == graft.text.TextOps.round6(b))
          assert(gs == graft.text.TextOps.round6(sNew))
          assert(gf == graft.text.TextOps.round6(l + b + seas.head))
      }
    }
    // the property neither ewma nor holt has: on trend + weekly season,
    // the one-step forecast converges to the true next value.
    val pat = Array(40.0, -10.0, 0.0, 25.0, -30.0, -15.0, -10.0)
    def sig(t: Int): Double = 100.0 + 2.0 * t + pat(t % 7)
    var l2 = (1 to 7).map(sig).sum / 7
    var s2 = Vector.tabulate(7)(j => sig(j + 1) - l2)
    var b2 = 0.0
    var hwErr = 0.0
    (8 to 120).foreach { t =>
      val f = l2 + b2 + s2.head
      hwErr = math.abs(f - sig(t))
      val sP = s2.head
      val lp = l2
      l2 = Events.HwAlpha * (sig(t) - sP) +
        Events.HwOneMinusAlpha * (lp + b2)
      b2 = Events.HwBeta * (l2 - lp) + Events.HwOneMinusBeta * b2
      s2 = s2.tail :+ (Events.HwGamma * (sig(t) - l2) +
        Events.HwOneMinusGamma * sP)
    }
    // plain Holt on the same signal for the comparative bound
    var hl = sig(1)
    var hb = 0.0
    var holtErr = 0.0
    (2 to 120).foreach { t =>
      holtErr = math.abs((hl + hb) - sig(t))
      val lp = hl
      hl = Events.HoltAlpha * sig(t) + Events.HoltOneMinusAlpha * (lp + hb)
      hb = Events.HoltBeta * (hl - lp) + Events.HoltOneMinusBeta * hb
    }
    // sub-0.2% of the ~340-magnitude signal, and >=10x better than the
    // season-blind Holt forecast — the property the third component buys.
    assert(hwErr < 1.0, s"HW forecast missed the periodic signal: $hwErr")
    assert(hwErr * 10 < holtErr,
      s"HW ($hwErr) not clearly beating season-blind Holt ($holtErr)")
  }

  test("ev_cusum replays the clamped two-sided recurrence exactly from " +
      "the integer moments, and alarms match the 4-sigma threshold") {
    val got = Events.queries("ev_cusum")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(got.nonEmpty)
    // recompute daily cents + moments from the raw table
    val daily = graft.Tables(spark, sfDir, "events").collect()
      .map(r => ((r.getString(r.fieldIndex("event_type")),
        math.floorDiv(
          math.floorDiv(r.getTimestamp(r.fieldIndex("ts")).getTime, 1000L)
            * 1000000L +
            r.getTimestamp(r.fieldIndex("ts")).getNanos / 1000L,
          Events.DayUs)),
        BigDecimal(r.getDouble(r.fieldIndex("value")) * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .groupMapReduce(_._1)(_._2)(_ + _)
    got.groupBy(_._1).foreach { case (typ, rows) =>
      val cs = daily.collect { case ((t, d), c) if t == typ => (d, c) }
        .toSeq.sortBy(_._1)
      val n = cs.length.toLong
      assert(n >= 2, "single-day type must be excluded")
      val s1 = cs.map(_._2).sum
      val s2 = cs.map(c => c._2 * c._2).sum
      val mu = s1.toDouble / n / 100
      val sd = math.sqrt((n * s2 - s1 * s1).toDouble /
        (n * (n - 1)).toDouble) / 100
      val k = Events.CusumKSigma * sd
      val h = Events.CusumHSigma * sd
      var sp = 0.0
      var sn = 0.0
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == cs.map(_._1))
      sorted.zip(cs).foreach { case ((_, _, gd, gp, gn, ga), (_, c)) =>
        val x = c.toDouble / 100
        sp = math.max(0.0, sp + (x - mu - k))
        sn = math.max(0.0, sn + (mu - x - k))
        assert(gd == x)
        assert(gp == graft.text.TextOps.round6(sp))
        assert(gn == graft.text.TextOps.round6(sn))
        assert(ga == (if (sp > h || sn > h) 1L else 0L))
        assert(gp >= 0.0 && gn >= 0.0)
      }
    }
  }

  test("ev_trigrams: brute per-user sequence replay and the exact " +
      "deterministic top-N cut") {
    val got = Events.queries("ev_trigrams")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got.length == Events.TrigramTopN)
    val evs = graft.Tables(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val want = evs.groupBy(_._1).values.flatMap { u =>
      val s = u.sortBy(t => (t._2, t._3)).map(_._4)
      s.sliding(3).filter(_.length == 3).map(w => (w(0), w(1), w(2)))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy(t => (-t._4, t._1, t._2, t._3)).take(Events.TrigramTopN)
    assert(got.toSeq == want)
  }

  test("ev_markov_entropy: brute replay from the bigram counts; " +
      "0 <= H <= log2(branching)") {
    val got = Events.queries("ev_markov_entropy")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val big = Events.queries("ev_markov")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byFrom = big.groupBy(_._1)
    assert(got.keySet == byFrom.keySet && got.nonEmpty)
    byFrom.foreach { case (f, ts) =>
      val n = ts.map(_._3).sum
      val terms = ts.sortBy(_._2).map(_._3)
      val s = terms.foldLeft(0.0)((a, c) => a + c * math.log(c.toDouble))
      val h = (math.log(n.toDouble) - s / n) / math.log(2.0)
      val (gn, gk, gh) = got(f)
      assert((gn, gk) == ((n, ts.length.toLong)), s"state $f")
      assert(gh == graft.text.TextOps.round6(h))
      assert(gh >= 0.0 &&
        gh <= math.log(ts.length.toDouble) / math.log(2.0) + 1e-9)
    }
  }

  test("ev_stickiness: exact trailing-7-day WAU via the cover explode " +
      "equals a brute per-day window scan; DAU <= WAU <= 7*DAU") {
    val got = Events.queries("ev_stickiness")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val ud = graft.Tables(spark, sfDir, "events")
      .selectExpr("user_id", s"unix_micros(ts) div ${Events.DayUs} AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = ud.map(_._2).distinct
    assert(got.keySet == days.toSet && got.nonEmpty)
    days.foreach { d =>
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter(t => t._2 >= d - 6 && t._2 <= d)
        .map(_._1).distinct.length.toLong
      val (gd, gw, gs) = got(d)
      assert((gd, gw) == ((dau, wau)))
      assert(gs == graft.text.TextOps.round6(dau.toDouble / wau))
      assert(dau <= wau && wau <= 7 * dau)
    }
  }

  test("ev_ab_welch: brute replay of the moment algebra per type pair, " +
      "t sign agrees with the mean ordering") {
    val rows = Events.queries("ev_ab_welch")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    // brute daily cents → moments on the driver
    val daily = graft.Tables(spark, sfDir, "events")
      .selectExpr("event_type",
        s"unix_micros(ts) div ${Events.DayUs} AS day",
        "CAST(round(value * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum)
      .toSeq.map { case ((t, d), c) => (t, c) }
    val mom = daily.groupBy(_._1).view.mapValues { xs =>
      val n = xs.length.toLong
      (n, xs.map(_._2).sum, xs.map(x => x._2 * x._2).sum)
    }.toMap
    val types = mom.keys.toSeq.sorted
    assert(rows.size == types.combinations(2).size && rows.nonEmpty)
    for (Seq(ta, tb) <- types.combinations(2)) {
      val (na, sxa, sxxa) = mom(ta)
      val (nb, sxb, sxxb) = mom(tb)
      val ma = sxa.toDouble / na
      val mb = sxb.toDouble / nb
      val va = (sxxa - sxa.toDouble * sxa / na) / (na - 1)
      val vb = (sxxb - sxb.toDouble * sxb / nb) / (nb - 1)
      val (sea, seb) = (va / na, vb / nb)
      val se2 = sea + seb
      val t = (ma - mb) / math.sqrt(se2)
      val dof = se2 * se2 / (sea * sea / (na - 1) + seb * seb / (nb - 1))
      val got = rows((ta, tb))
      val r6 = graft.text.TextOps.round6 _
      assert(got == ((na, nb, r6(ma), r6(mb), r6(t), r6(dof))))
      assert((got._5 > 0) == (ma > mb) || got._5 == 0.0)
      // Welch dof sits between min(n)-1 and n_a+n_b-2
      assert(dof >= math.min(na, nb) - 1 - 1e-9 && dof <= na + nb - 2 + 1e-9)
    }
  }

  test("ev_attrib_linear on the bench table: per-purchase credit " +
      "conservation (sum within n-1 microcents of the purchase)") {
    val credits = Events.queries("ev_attrib_linear")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("credit_ucents"))
      .collect()(0).getLong(0)
    // every credited µ¢ must trace to a purchase: total credited ≤ total
    // purchase µ¢, and > 0 on the bench table (clicks and purchases
    // interleave every few minutes at sf0.001 vs the 1800 s window).
    val totalPurch = graft.Tables(spark, sfDir, "events")
      .where(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("CAST(round(value * 100) AS BIGINT) * 10000 AS uc")
      .agg(org.apache.spark.sql.functions.sum("uc")).collect()(0).getLong(0)
    assert(credits > 0L && credits <= totalPurch)
  }

  test("ev_hw_forecast: held-out errors replay the train-prefix fits " +
      "exactly, and HW beats season-blind Holt on a weekly signal") {
    val s = spark
    import s.implicits._
    val P = Events.HwPeriod
    val got = Events.queries("ev_hw_forecast")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8), r.getDouble(9)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (typ, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to P),
        s"$typ: exactly one row per held-out horizon")
      // the held-out days are the LAST P days of the type's series, and
      // the naive forecast is constant = the last train observation
      assert(rows.map(_._5).distinct.length == 1, s"$typ: naive varies")
      // error columns are consistent with the forecast columns at
      // display precision (|round(x−f)| vs |x−round(f)| differ < 2e-6)
      rows.foreach { t =>
        assert(math.abs(t._8 - math.abs(t._4 - t._5)) < 2e-6)
        assert(math.abs(t._9 - math.abs(t._4 - t._6)) < 2e-6)
        assert(math.abs(t._10 - math.abs(t._4 - t._7)) < 2e-6)
      }
    }

    // the model-selection claim on a SIGNAL THAT HAS what HW models: a
    // weekly pattern + linear trend (amplitude >> noise). hwForecast is
    // driven directly so the fixture is exact.
    val weekly = (0L until 30L).map { d =>
      val dow = (d % P).toInt
      val base = Seq(100.0, 220.0, 80.0, 150.0, 300.0, 40.0, 180.0)(dow)
      ("w", d, base + 2.0 * d)
    }
    val fc = Events.hwForecast(weekly.toDF("event_type", "day", "daily"))
      .collect().map(r => (r.getDouble(8), r.getDouble(9)))
    assert(fc.length == P)
    val (maeHolt, maeHw) = (fc.map(_._1).sum / P, fc.map(_._2).sum / P)
    assert(maeHw < maeHolt,
      s"HW (mae $maeHw) must beat season-blind Holt (mae $maeHolt) on " +
        "a weekly signal")
    // and the fixture itself is weekly (ev_seasonality shows it):
    // HW must beat Holt on total held-out MAE there too
    val (fixHolt, fixHw) = (got.map(_._9).sum, got.map(_._10).sum)
    assert(fixHw < fixHolt,
      s"fixture total ae: hw $fixHw vs holt $fixHolt")
  }
}
