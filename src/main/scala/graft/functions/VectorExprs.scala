package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, sqrt}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * The embedding similarity queries (SURVEY §7.5) previously computed
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (s,x) -> s+x)`: Spark's
  * higher-order functions allocate a zipped intermediate array per row and
  * evaluate the lambda through interpreted `CodegenFallback`, breaking the
  * whole-stage-codegen span exactly where the per-row work is heaviest
  * (|corpus| × |queries| cosine evaluations). This expression emits a tight
  * fused Java loop instead — no intermediate array, no lambda dispatch —
  * and keeps the surrounding projection inside one codegen stage.
  *
  * Semantics match the higher-order formulation bit-for-bit: products are
  * accumulated left-to-right in double precision (same fold order as
  * `aggregate`, and as DuckDB's `list_reduce` oracle), a length mismatch
  * or a null element yields NULL (as zip-padding / null-propagation
  * would), and a null array yields NULL.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // return type inferred: Seq[ArrayType] <: Seq[AbstractDataType], whose
  // name is private[sql] and so cannot be written here
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  // NULL also on length mismatch, not only on null input.
  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Column + SQL-registry surface for the vector expressions.
  *
  * The Column helpers resolve through the session function registry
  * (`call_function` — the public route to a custom Expression in Spark 4,
  * where direct `Column(expr)` construction is `private[sql]`), so
  * [[register]] must have been called on the analyzing session first.
  */
object VectorFunctions {

  /** `a · b` via the fused kernel. Requires [[register]] on the session. */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** L2 norm via the same fused kernel: `sqrt(v · v)`. */
  def vecNorm(v: Column): Column = sqrt(call_function("vec_dot", v, v))

  /** Registers `vec_dot` for `selectExpr`/SQL use on this session.
    * Idempotent (`createOrReplaceTempFunction`).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      (children: Seq[Expression]) => VecDot(children.head, children(1)),
      "scala_udf")
}
