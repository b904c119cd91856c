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

  test("q25_null_anti_join plans the null-aware anti join, equals the " +
      "NOT EXISTS brute force (the subquery column is never null), and " +
      "one real NULL in the set empties the result") {
    val s = spark
    import s.implicits._
    val df = Relational.queries("q25_null_anti_join")(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // nullif(o_custkey, -1) never fires (custkeys positive), so the
    // result must equal plain NOT EXISTS semantics
    val buyers = graft.Tables(spark, sfDir, "orders")
      .where(col("o_totalprice") > 300000)
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val want = graft.Tables(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filterNot(c => buyers.contains(c._1)).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must keep some non-buyers")
    // the physical shape: the single-column null-aware anti join — a
    // plain LeftAnti would be WRONG under three-valued logic, a
    // BroadcastNestedLoopJoin would be the multi-column degradation
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "single-column NOT IN must take the NAAJ fast path, not BNLJ")
    // three-valued logic live: one genuine NULL in the set -> empty
    val cust = Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
    val sub = Seq(Some(1L), None).toDF("k")
    cust.createOrReplaceTempView("naaj_cust")
    sub.createOrReplaceTempView("naaj_sub")
    val withNull = spark.sql(
      "SELECT c_custkey FROM naaj_cust WHERE c_custkey NOT IN " +
        "(SELECT k FROM naaj_sub)")
    assert(withNull.count() == 0L,
      "a NULL member makes every NOT IN test UNKNOWN")
  }
}
