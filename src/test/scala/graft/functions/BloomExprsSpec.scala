package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomExprsSpec extends SparkSpec {

  test("bloom_might_contain: no false negatives, bounded false positives") {
    import spark.implicits._
    val members = (0L until 1000L).map(_ * 7L)
    val bf = members.toDF("k").stat.bloomFilter("k", 1000L, 0.01)
    val probe = (0L until 10000L).toDF("k")
    val kept = probe
      .where(BloomFunctions.mightContainLong(spark, bf, col("k")))
      .collect().map(_.getLong(0)).toSet
    val memberSet = members.toSet
    assert(memberSet.subsetOf(kept), "a bloom filter never drops a member")
    val fp = kept.size - memberSet.count(_ < 10000L)
    assert(fp <= 10000 / 10, s"false-positive mass $fp far above the 1% design point")
  }

  test("expression stays inside whole-stage codegen over a real scan") {
    import spark.implicits._
    // a LocalTableScan folds filters at plan time — use the parquet scan
    // the production query filters, and check the generated span.
    val li = graft.Tables(spark, sfDir, "lineitem").select(col("l_orderkey"))
    val keys = li.limit(10).collect().map(_.getLong(0))
    val bf = keys.toSeq.toDF("k").stat.bloomFilter("k", 100L, 0.01)
    val df = li.where(BloomFunctions.mightContainLong(spark, bf, col("l_orderkey")))
    val plan = df.queryExecution.executedPlan.toString()
    // `*(n)` marks a whole-stage-codegen span in the executed plan.
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Filter bloom_might_contain.*"),
      s"pruning filter not in a codegen span:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in the pruning path:\n$plan")
    val kept = df.collect().map(_.getLong(0)).toSet
    assert(keys.toSet.subsetOf(kept))
  }

  test("repeated sketch builds don't grow the FunctionRegistry") {
    import spark.implicits._
    val bf = Seq(1L, 2L).toDF("k").stat.bloomFilter("k", 100L, 0.01)
    def bloomEntries: Int = spark.sessionState.functionRegistry
      .listFunction().count(_.funcName.startsWith("graft_bloom_might_contain"))
    // build-then-use, as every production call site does
    def run(): Unit = {
      val n = Seq(1L, 2L, 3L).toDF("k")
        .where(BloomFunctions.mightContainLong(spark, bf, col("k")))
        .count()
      assert(n >= 2)
    }
    (1 to 3 * BloomFunctions.LiveWindow).foreach(_ => run())
    assert(bloomEntries <= BloomFunctions.LiveWindow,
      s"registry grew past the live window: $bloomEntries entries pinned")
  }

  test("several live sketch Columns can be combined before first use") {
    import spark.implicits._
    val bfA = Seq(1L, 2L).toDF("k").stat.bloomFilter("k", 100L, 0.01)
    val bfB = Seq(2L, 3L).toDF("k").stat.bloomFilter("k", 100L, 0.01)
    // build BOTH Columns before either lands in a Dataset — the
    // one-live-registration scheme failed analysis on colA here.
    val colA = BloomFunctions.mightContainLong(spark, bfA, col("k"))
    val colB = BloomFunctions.mightContainLong(spark, bfB, col("k"))
    val n = Seq(1L, 2L, 3L, 9L).toDF("k").where(colA && colB).count()
    assert(n >= 1) // 2 passes both; 9 in neither (modulo fp rate)
  }

  test("null keys propagate as filtered rows, no NPE") {
    import spark.implicits._
    val bf = Seq(1L, 2L).toDF("k").stat.bloomFilter("k", 100L, 0.01)
    val got = Seq(Some(1L), Some(99L), None).toDF("k")
      .where(BloomFunctions.mightContainLong(spark, bf, col("k")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }
}
