package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Bounded bottom-k sample buffer of [[BottomKSample]]: the k pairs with
  * the smallest (hash, id) total-order key, each carrying a double
  * payload. Never holds more than k entries, so a partial aggregate
  * ships at most k (16-byte key + 8-byte value) rows per group however
  * large the group — the mergeable-uniform-sample property that lets the
  * quantile sketch stream.
  */
final class SampleBuffer(val k: Int) {
  val map = collection.mutable.TreeMap.empty[(Long, Long), Double]

  def add(h: Long, id: Long, v: Double): Unit = {
    val key = (h, id)
    if (map.size < k) { map(key) = v; () }
    else if (Ordering[(Long, Long)].lt(key, map.lastKey) &&
        !map.contains(key)) {
      map(key) = v
      map.remove(map.lastKey): Unit
    }
  }
}

/** Deterministic bottom-k-by-hash sample as a custom Catalyst aggregate:
  * keeps the values of the k rows with the smallest (hash, id) key per
  * group and returns them SORTED ASCENDING BY VALUE — exactly the
  * multiset the batch `ev_value_quantiles` sample cut (`ORDER BY hm,
  * event_id LIMIT k`) selects, ready for rank-based quantile selection
  * with `element_at`. The id rides along only to break hash ties the
  * same way the batch window does.
  *
  * Scale story: the same argument as [[KmvKth]] — a k-bounded buffer
  * with map-side combine where an exact per-group quantile would shuffle
  * every value; and unlike `percentile_approx` the selection is
  * bit-reproducible and merge-order-free, so a streaming window's state
  * can be pinned equal to the batch row in spec.
  */
case class BottomKSample(
    hashExpr: Expression,
    idExpr: Expression,
    valExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SampleBuffer] with ImplicitCastInputTypes {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int =>
      require(i > 0, s"bottom_k_sample: k must be positive, got $i"); i
    case other => throw new IllegalArgumentException(
      s"bottom_k_sample: k must be a foldable INT literal, got $other")
  }

  override def children: Seq[Expression] =
    Seq(hashExpr, idExpr, valExpr, kExpr)
  override def inputTypes = Seq(LongType, LongType, DoubleType, IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_sample"

  override def createAggregationBuffer(): SampleBuffer = new SampleBuffer(k)

  override def update(buf: SampleBuffer, input: InternalRow): SampleBuffer = {
    val h = hashExpr.eval(input)
    val id = idExpr.eval(input)
    val v = valExpr.eval(input)
    if (h != null && id != null && v != null)
      buf.add(h.asInstanceOf[Long], id.asInstanceOf[Long],
        v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: SampleBuffer, other: SampleBuffer): SampleBuffer = {
    other.map.foreach { case ((h, id), v) => buf.add(h, id, v) }
    buf
  }

  override def eval(buf: SampleBuffer): Any =
    new GenericArrayData(buf.map.values.toArray.sorted)

  override def serialize(buf: SampleBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 24 * buf.map.size)
    bb.putInt(buf.k).putInt(buf.map.size)
    buf.map.foreach { case ((h, id), v) =>
      bb.putLong(h).putLong(id).putDouble(v): Unit
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SampleBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new SampleBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.add(bb.getLong(), bb.getLong(), bb.getDouble())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSample =
    copy(hashExpr = newChildren(0), idExpr = newChildren(1),
      valExpr = newChildren(2), kExpr = newChildren(3))
}

/** Column + SQL-registry surface for [[BottomKSample]]. */
object SampleFunctions {

  /** Values of the k rows with the smallest (h, id) per group, sorted
    * ascending (k a literal). Requires [[register]].
    */
  def bottomKSample(h: Column, id: Column, v: Column, k: Int): Column =
    call_function("bottom_k_sample", h, id, v,
      org.apache.spark.sql.functions.lit(k))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottom_k_sample",
      (children: Seq[Expression]) => BottomKSample(children.head,
        children(1), children(2), children(3)),
      "scala_udf")
}
