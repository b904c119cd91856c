package graft.functions


import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** KthScore must agree with the tie-inclusive window-RANK formulation it
  * replaces, and must aggregate with a partial (map-side) phase — the
  * scale reason it exists.
  */
class TopKAggSpec extends SparkSpec {

  test("kth_score filter == tie-inclusive RANK <= k, incl. ties and short groups") {
    TopKFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 40 groups x 0..99 rows with deliberate duplicate scores (ties), and
    // a couple of groups shorter than k.
    val rows = (0 until 40).flatMap { g =>
      val n = if (g < 2) 3 else 20 + rnd.nextInt(80)
      (0 until n).map(_ => (g.toLong, (rnd.nextInt(15) / 2.0)))
    }
    val df = rows.toDF("g", "score").repartition(7)
    val k = 5

    val th = df.groupBy("g").agg(TopKFunctions.kthScore(col("score"), k).as("th"))
    val viaAgg = df.join(th, "g").where(col("score") >= col("th"))
      .groupBy("g").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val w = Window.partitionBy("g").orderBy(col("score").desc)
    val viaRank = df.withColumn("rk", rank().over(w)).where(col("rk") <= k)
      .groupBy("g").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(viaAgg == viaRank)
    // short groups: every row kept (threshold -Inf), same as RANK <= k.
    assert(viaAgg(0L) == 3 && viaAgg(1L) == 3)
  }

  test("kth_score ignores nulls and handles duplicates at the boundary") {
    TopKFunctions.register(spark)
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 5.0d), (1L, 5.0d), (1L, 5.0d), (1L, 1.0d), (1L, CAST(NULL AS DOUBLE)),
        |  (2L, 9.0d), (2L, 8.0d), (2L, 7.0d), (2L, 6.0d)
        |AS t(g, score)""".stripMargin)
    val got = df.groupBy("g")
      .agg(TopKFunctions.kthScore(col("score"), 2).as("th"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // group 1: top-2 of (5,5,5,1) -> kth = 5.0 (duplicates counted); null skipped
    assert(got(1L) == 5.0)
    assert(got(2L) == 8.0)
  }

  test("kth_score aggregates with a partial map-side phase") {
    TopKFunctions.register(spark)
    import spark.implicits._
    val df = (0 until 1000).map(i => ((i % 10).toLong, i.toDouble)).toDF("g", "score")
      .repartition(4)
      .groupBy("g").agg(TopKFunctions.kthScore(col("score"), 3).as("th"))
    // TypedImperativeAggregate plans as ObjectHashAggregate, partial +
    // final (string check: AQE hides the inner plan from collect()).
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_kth_score"),
      s"expected a partial (map-side) kth_score phase:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$plan")
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // group g holds g, g+10, ..., g+990; 3rd largest = g + 970.
    assert((0L until 10L).forall(g => got(g) == g + 970.0))
  }
}
