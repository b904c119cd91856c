package graft.functions

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native VecDot kernel must be a drop-in for the higher-order
  * `aggregate(zip_with(...))` formulation: identical values (same fold
  * order), identical null semantics, and — the point of its existence —
  * it must run inside whole-stage codegen instead of forcing a
  * CodegenFallback project.
  */
class VectorExprsSpec extends SparkSpec {

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (s, x) -> s + x)"

  test("vec_dot matches aggregate(zip_with) bit-for-bit on random vectors") {
    VectorFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(64)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    import spark.implicits._
    val df = rows.toDF("a", "b")
      .selectExpr("vec_dot(a, b) AS fused", s"$hof AS folded")
    assert(df.where(col("fused") =!= col("folded")).count() == 0)
    // bit-for-bit, not approximately: java double equality via =!= above,
    // plus a driver-side re-check of the first row against a plain loop.
    val (a, b) = rows.head
    val expect = (0 until 64).foldLeft(0.0)((s, i) => s + a(i) * b(i))
    assert(df.select("fused").head.getDouble(0) == expect)
  }

  test("vec_dot null semantics: null array, null element, length mismatch") {
    VectorFunctions.register(spark)
    val df = spark.sql(
      """SELECT vec_dot(a, b) AS d FROM VALUES
        |  (array(1d, 2d), array(3d, 4d)),
        |  (CAST(NULL AS array<double>), array(3d, 4d)),
        |  (array(1d, CAST(NULL AS double)), array(3d, 4d)),
        |  (array(1d, 2d, 5d), array(3d, 4d))
        |AS t(a, b)""".stripMargin)
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None, None, None))
  }

  test("vec_dot projection stays inside whole-stage codegen") {
    VectorFunctions.register(spark)
    // a parquet scan, not a local relation — ConvertToLocalRelation would
    // constant-fold a literal input before any codegen span exists.
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .selectExpr("vec_dot(v, v) AS d")
      .where(col("d") > 0)
    val wsc = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec if w.toString.contains("vec_dot") => w
    }
    assert(wsc.nonEmpty, s"no codegen span covers vec_dot:\n${df.queryExecution.executedPlan}")
    assert(df.count() > 0)
  }

  test("vecDot/vecNorm Column API agrees with SQL registration") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(3.0, 4.0), Array(1.0, 0.0))).toDF("a", "b")
      .select(
        VectorFunctions.vecDot(col("a"), col("b")).as("d"),
        VectorFunctions.vecNorm(col("a")).as("n"))
    val r = df.head
    assert(r.getDouble(0) == 3.0)
    assert(r.getDouble(1) == 5.0)
  }
}
