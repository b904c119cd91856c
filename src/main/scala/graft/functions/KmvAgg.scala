package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Bounded set of the k smallest DISTINCT longs seen — the aggregation
  * buffer of [[KmvKth]]. Never holds more than k values, so a partial
  * aggregate ships at most k longs per group regardless of group size —
  * the KMV (k-minimum-values) cardinality-sketch property.
  */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(v: Long): Unit = {
    if (set.size < k) { set.add(v): Unit }
    else if (v < set.last && !set.contains(v)) {
      set.add(v)
      set.pollLast(): Unit
    }
  }
}

/** kth-smallest DISTINCT value of a long column per group (null when the
  * group holds fewer than k distinct values) — the KMV cardinality
  * sketch's order statistic as a custom Catalyst aggregate. With
  * uniformly-hashed inputs, mapping the returned h_k to the unit
  * interval u over the hash's range gives the distinct-count estimate
  * (k−1)/u (Bar-Yossef et al. 2002, the classic KMV bound); the caller
  * owns the mapping because it depends on the hash's actual range
  * (e.g. [0, P) for the TextOps rolling hash).
  *
  * Scale story — why not `count(DISTINCT …)`: exact distinct counting
  * shuffles EVERY distinct value per group; this buffer is k-bounded
  * with partial aggregation (map-side combine), so each map task ships
  * ≤ k longs per group however large the corpus. The estimate itself is
  * left to the caller's SQL so both engines evaluate the identical IEEE
  * expression over the identical integer.
  */
case class KmvKth(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with ImplicitCastInputTypes {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => require(i > 1, s"kmv_kth: k must exceed 1, got $i"); i
    case other => throw new IllegalArgumentException(
      s"kmv_kth: k must be a foldable INT literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_kth"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    if (buf.set.size < buf.k) null else buf.set.last.longValue()

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.set.size)
    bb.putInt(buf.k).putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvKth =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvKth =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvKth =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** Column + SQL-registry surface for [[KmvKth]] (same `call_function`
  * route as [[TopKFunctions]]).
  */
object KmvFunctions {

  /** Per-group kth-smallest distinct of `h` (k a literal). Requires
    * [[register]].
    */
  def kmvKth(h: Column, k: Int): Column =
    call_function("kmv_kth", h, org.apache.spark.sql.functions.lit(k))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_kth",
      (children: Seq[Expression]) => KmvKth(children.head, children(1)),
      "scala_udf")
}
