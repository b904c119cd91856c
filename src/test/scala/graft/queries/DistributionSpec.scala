package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{SparkSpec, Tables}

/** Pins the scale-safe `q19_distribution` spelling (range-partitioned
  * ranks + per-range offsets, [[Relational.distribution]]) bit-identical
  * to the monolithic per-status window it replaced, and plan-asserts
  * that no window node partitions by the ~3-value status key alone.
  */
class DistributionSpec extends SparkSpec {

  test("rank-offset fold ≡ monolithic per-status window, bit-identical") {
    val got = Relational.queries("q19_distribution")(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val old = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .withColumn("tile", ntile(4).over(w))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(got.length == old.length && got.nonEmpty)
    got.zip(old).foreach { case (g, o) => assert(g == o) }
  }

  test("every window in the plan partitions by (status, pid) — never " +
      "the 3-value status key alone") {
    val plan = Relational.queries("q19_distribution")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val specs = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty, plan)
    specs.foreach(l => assert(l.contains("pid#"), l))
  }
}
