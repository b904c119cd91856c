package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** TopKRewrite must be a pure plan transformation: identical rows AND
  * identical rank values, with the kth_score aggregate visible in the
  * optimized plan, and no rewrite for patterns outside its trigger.
  */
class TopKRewriteSpec extends SparkSpec {

  private def rankTopK(k: Int) = {
    val s = spark
    import s.implicits._
    // parquet-backed so the plan is a realistic scan, with deliberate
    // score ties (round to 1 decimal) to exercise tie-inclusive RANK.
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id % 7 AS g", "CAST(round(element_at(embedding, 1), 1) AS DOUBLE) AS score")
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc)
    df.withColumn("rk", rank().over(w)).where(col("rk") <= k)
  }

  private def collectSorted(k: Int) =
    rankTopK(k).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .sortBy(x => (x._1, -x._2, x._3)).toSeq

  test("rewrite preserves rows and rank values, and fires in the plan") {
    val baseline = collectSorted(5)
    spark.experimental.extraOptimizations = Seq(TopKRewrite)
    spark.conf.set(TopKRewrite.MinBytesKey, "0")
    try {
      val q = rankTopK(5)
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains(TopKRewrite.ThresholdName),
        s"rule did not fire:\n$plan")
      val got = q.collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
        .sortBy(x => (x._1, -x._2, x._3)).toSeq
      assert(got == baseline)
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(TopKRewrite.MinBytesKey)
    }
  }

  test("size gate: no rewrite below spark.graft.topk.rewriteMinBytes") {
    spark.experimental.extraOptimizations = Seq(TopKRewrite)
    try {
      // default gate is 1 GiB; the test table is tiny -> must not fire.
      val plan = rankTopK(5).queryExecution.optimizedPlan.toString
      assert(!plan.contains(TopKRewrite.ThresholdName), s"fired on tiny input:\n$plan")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("no rewrite for row_number, ascending order, or non-literal bounds") {
    val s = spark
    import s.implicits._
    spark.experimental.extraOptimizations = Seq(TopKRewrite)
    spark.conf.set(TopKRewrite.MinBytesKey, "0")
    try {
      val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr("vec_id % 7 AS g", "CAST(element_at(embedding, 1) AS DOUBLE) AS score")
      val w = Window.partitionBy(col("g")).orderBy(col("score").desc)
      val rn = df.withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      assert(!rn.queryExecution.optimizedPlan.toString.contains(TopKRewrite.ThresholdName))
      val asc = df.withColumn("rk",
          rank().over(Window.partitionBy(col("g")).orderBy(col("score").asc)))
        .where(col("rk") <= 5)
      assert(!asc.queryExecution.optimizedPlan.toString.contains(TopKRewrite.ThresholdName))
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(TopKRewrite.MinBytesKey)
    }
  }

  test("global top-k (no partition keys) rewrites via cross join") {
    val s = spark
    import s.implicits._
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(round(element_at(embedding, 1), 1) AS DOUBLE) AS score")
    val w = Window.orderBy(col("score").desc)
    def q = df.withColumn("rk", rank().over(w)).where(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).sortBy(_._1).toSeq
    val baseline = q
    spark.experimental.extraOptimizations = Seq(TopKRewrite)
    spark.conf.set(TopKRewrite.MinBytesKey, "0")
    try assert(q == baseline)
    finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(TopKRewrite.MinBytesKey)
    }
  }
}
