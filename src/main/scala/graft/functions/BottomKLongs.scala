package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Bounded distinct-min long set: the k smallest DISTINCT values per
  * group. This is the KMV sketch SET itself (where [[KmvKth]] keeps only
  * the kth order statistic for the cardinality estimate, set-operation
  * reads — `ev_kmv_overlap`'s union/intersection stage — need all k
  * members). Pure set semantics make it merge-order-FREE, unlike
  * [[graft.operators.MisraGries]]: any merge tree yields the identical
  * set, so streaming twins pin byte-equality, and the exact long channel
  * avoids [[BottomKSample]]'s double payload (mixed hashes live in
  * [0, P²) ≈ 2⁶⁰ — a double would round them). ≤ k longs of state per
  * group with map-side combine.
  */
final class LongSetBuffer(val k: Int) {
  val set = collection.mutable.TreeSet.empty[Long]

  def add(v: Long): Unit =
    if (set.size < k) { set.add(v): Unit }
    else if (v < set.lastKey && !set.contains(v)) {
      set.add(v): Unit
      set.remove(set.lastKey): Unit
    }
}

case class BottomKLongs(
    valExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongSetBuffer] with ImplicitCastInputTypes {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int =>
      require(i > 0, s"bottom_k_longs: k must be positive, got $i"); i
    case other => throw new IllegalArgumentException(
      s"bottom_k_longs: k must be a foldable INT literal, got $other")
  }

  override def children: Seq[Expression] = Seq(valExpr, kExpr)
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_longs"

  override def createAggregationBuffer(): LongSetBuffer = new LongSetBuffer(k)

  override def update(buf: LongSetBuffer, input: InternalRow): LongSetBuffer = {
    val v = valExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongSetBuffer, other: LongSetBuffer): LongSetBuffer = {
    other.set.foreach(buf.add)
    buf
  }

  override def eval(buf: LongSetBuffer): Any =
    new GenericArrayData(buf.set.toArray) // TreeSet iterates ascending

  override def serialize(buf: LongSetBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.set.size)
    bb.putInt(buf.k).putInt(buf.set.size)
    buf.set.foreach(v => bb.putLong(v): Unit)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongSetBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new LongSetBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKLongs =
    copy(valExpr = newChildren(0), kExpr = newChildren(1))
}

/** Column + SQL-registry surface for [[BottomKLongs]]. */
object LongSetFunctions {

  /** The k smallest distinct values of `v` per group, sorted ascending
    * (k a literal). Requires [[register]].
    */
  def bottomKLongs(v: Column, k: Int): Column =
    call_function("bottom_k_longs", v,
      org.apache.spark.sql.functions.lit(k))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottom_k_longs",
      (children: Seq[Expression]) => BottomKLongs(children.head, children(1)),
      "scala_udf")
}
