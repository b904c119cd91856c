package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-sketch membership test over a LONG key column — the
  * pruning predicate of `q13_bloom_join`.
  *
  * A Scala UDF here would sit on every fact row ahead of the join and
  * break the scan's whole-stage-codegen span exactly where row volume is
  * highest; this expression compiles to a direct
  * `filter.mightContainLong(key)` call inside the generated scan loop
  * (the same shape as Spark's internal `BloomFilterMightContain`, which
  * the optimizer's InjectRuntimeFilter uses but does not expose). The
  * sketch rides the expression as a reference object: broadcast-once per
  * executor via task-binary serialization.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Column surface. Direct `Column(expr)` construction is `private[sql]`
  * in Spark 4, so each call registers a uniquely-named temp function whose
  * builder captures the sketch and resolves through `call_function` (the
  * same route as [[VectorFunctions]]).
  */
object BloomFunctions {

  private val ids = new AtomicLong(0L)
  /** How many bloom registrations stay live per session. Registry entries
    * only need to survive until the Column lands in an analyzed Dataset,
    * but callers may build several sketch Columns before using the first
    * (e.g. combining two sketches in one predicate) — so keep a small
    * window instead of exactly one.
    */
  val LiveWindow = 8
  /** Recent bloom function names per session (weakly keyed by the
    * session's FunctionRegistry), oldest dropped beyond [[LiveWindow]] —
    * a long-lived session pins at most [[LiveWindow]] historical sketches
    * instead of every sketch it ever built.
    */
  private val recent = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, scala.collection.mutable.Queue[String]]())

  /** `filter.mightContainLong(key)` as a codegen'd Column predicate.
    *
    * Registrations older than the last [[LiveWindow]] are dropped — place
    * a built Column into a Dataset (analysis is eager) within
    * [[LiveWindow]] subsequent sketch builds on the same session.
    */
  def mightContainLong(spark: SparkSession, filter: BloomFilter, key: Column): Column = {
    val name = s"graft_bloom_might_contain_${ids.incrementAndGet()}"
    val registry = spark.sessionState.functionRegistry
    recent.synchronized {
      val q = recent.computeIfAbsent(registry,
        _ => scala.collection.mutable.Queue.empty[String])
      q.enqueue(name)
      while (q.length > LiveWindow)
        registry.dropFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier(q.dequeue()))
      // register INSIDE the same critical section: with concurrent builds
      // a name could otherwise be dequeued + dropFunction'd (a no-op)
      // before its registration lands, leaving an orphan that is never
      // evicted and transiently breaking the LiveWindow bound.
      registry.createOrReplaceTempFunction(
        name,
        (children: Seq[Expression]) => BloomMightContain(children.head, filter),
        "scala_udf")
    }
    call_function(name, key)
  }
}
