package graft.queries

import graft.{SparkSpec, Tables}

class LenGiniSpec extends SparkSpec {

  test("d_len_gini matches the brute-force rank-formula Gini and its " +
      "integer moments") {
    val r = Text.queries("d_len_gini")(spark, sfDir).collect()(0)

    val lens = Tables(spark, sfDir, "documents")
      .select("n_chars", "doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(identity) // (n_chars, doc_id) — the query's total order
    val n = lens.length.toLong
    val sX = lens.map(_._1).sum
    val sIx = lens.zipWithIndex.map { case ((x, _), i) => (i + 1) * x }.sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((n, sX, sIx)))

    val want = (2 * sIx - (n + 1) * sX).toDouble / (n * sX).toDouble
    assert(r.getDouble(3) == want) // exact integer operands → same double
    // Gini of positive values: [0, 1); the synthetic corpus has genuine
    // length spread, so strictly > 0
    assert(want > 0.0 && want < 1.0)
  }

  test("the range-partitioned fold plans with NO window node — the " +
      "single-task row_number() sort is gone") {
    val df = Text.queries("d_len_gini")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("window"), plan)
  }

  test("fold ≡ unpartitioned row_number() formulation on a tie-heavy " +
      "synthetic corpus spanning every range partition") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // 1,000 docs, only 7 distinct lengths — ties straddle the 4 range
    // boundaries, so correctness rides entirely on the unique
    // (n_chars, doc_id) sort key, not on lucky boundary placement.
    val docs = (1L to 1000L).map(id => (id * 31 % 7 * 100 + 50, id))
      .toDF("n_chars", "doc_id")
    val got = Text.lenGini(docs).collect()(0)
    val old = docs
      .withColumn("i", row_number().over(
        Window.orderBy(col("n_chars"), col("doc_id"))))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("s_x"),
        sum(expr("i * n_chars")).as("s_ix"))
      .selectExpr("n_docs", "s_x", "s_ix",
        "CAST(2 * s_ix - (n_docs + 1) * s_x AS DOUBLE) / " +
          "CAST(n_docs * s_x AS DOUBLE) AS gini")
      .collect()(0)
    assert(got == old)
  }
}
