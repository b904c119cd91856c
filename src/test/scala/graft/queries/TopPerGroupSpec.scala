package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TopPerGroupSpec extends SparkSpec {

  test("q23_top1_per_group: the argmax aggregate equals the windowed " +
      "top-1 brute force and plans WITHOUT a Window node") {
    val df = Relational.queries("q23_top1_per_group")(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val rows = Tables(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate")).as("d_us"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = rows.groupBy(_._1).map { case (ck, os) =>
      // the struct total order: max date, tie -> max orderkey
      val (_, ok, d, c) = os.maxBy(o => (o._3, o._2))
      (ck, ok, d, c.toDouble / 100.0)
    }.toSet
    assert(got == want)
    // every customer appears exactly once
    assert(df.collect().map(_.getLong(0)).distinct.length == want.size)
    // the scale contract: ONE mergeable aggregate, no per-partition sort
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "argmax must not plan a window")
    assert(plan.contains("Aggregate"), "expected an aggregate plan")
  }

  test("q24_moving_avg: the RANGE frame equals the per-row trailing " +
      "window brute force and partitions on the high-card custkey") {
    val df = Relational.queries("q24_moving_avg")(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet

    val widthUs = Relational.QMovDays * graft.queries.Events.DayUs
    val rows = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate")).as("d_us"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCust = rows.groupBy(_._2)
    val want = rows.map { case (ok, ck, d, _) =>
      val in = byCust(ck).filter(o => o._3 >= d - widthUs && o._3 <= d)
      val n = in.length.toLong
      val s = in.map(_._4).sum
      val avg = BigDecimal(s.toDouble / n / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (ok, ck, d, n, avg)
    }.toSet
    assert(got == want)
    // the frame genuinely varies (not every row sees the same count)
    assert(got.map(_._4).size > 1, "fixture must exercise varying frames")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeFrame") || plan.contains("RANGE BETWEEN"),
      "expected a RANGE frame window")
    assert(plan.contains("o_custkey"), "window must partition on custkey")
  }
}
