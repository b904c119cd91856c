package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Bounded bottom-k sample buffer of [[BottomKSample]]: the k ROWS with
  * the smallest (hash, id, value) total-order key, kept as a MULTISET
  * (key → multiplicity) — duplicate (hash, id) rows, e.g. replayed
  * events sharing an event_id, must each count exactly as the batch
  * window's `rs <= k` cut counts them, and the value joins the order key
  * so which duplicate survives the boundary is deterministic rather
  * than merge-order-dependent. Never holds more than k total rows, so a
  * partial aggregate ships at most k entries per group however large
  * the group — the mergeable-uniform-sample property that lets the
  * quantile sketch stream.
  */
final class SampleBuffer(val k: Int) {
  val map = collection.mutable.TreeMap.empty[(Long, Long, Double), Long]
  private var n = 0L

  def add(h: Long, id: Long, v: Double): Unit = {
    // normalize -0.0 → 0.0 BEFORE keying: Scala's Ordering[Double]
    // (java.lang.Double.compare) sorts -0.0 < 0.0, while Spark SQL's sort
    // (SQLOrderingUtil) — the order the batch rs <= k cut uses — treats
    // them equal, so a zero-signed boundary row could otherwise pick a
    // different survivor here than in the batch window.
    val key = (h, id, if (v == 0.0) 0.0 else v)
    if (n < k) {
      map(key) = map.getOrElse(key, 0L) + 1
      n += 1
    } else if (Ordering[(Long, Long, Double)].lt(key, map.lastKey)) {
      map(key) = map.getOrElse(key, 0L) + 1
      val last = map.lastKey
      val c = map(last)
      if (c == 1L) map.remove(last): Unit else map(last) = c - 1
    }
  }
}

/** Deterministic bottom-k-by-hash sample as a custom Catalyst aggregate:
  * keeps the values of the k rows with the smallest (hash, id, value)
  * key per group and returns them SORTED ASCENDING BY VALUE — exactly
  * the multiset the batch `ev_value_quantiles` sample cut (`rs <= k`
  * over `ORDER BY hm, event_id, value`) selects, ready for rank-based
  * quantile selection with `element_at`. The id and value ride along in
  * the order key so hash ties — and duplicate-id rows — resolve
  * identically in both engines and independently of merge order.
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
    other.map.foreach { case ((h, id, v), c) =>
      var j = 0L
      while (j < c) { buf.add(h, id, v); j += 1 }
    }
    buf
  }

  override def eval(buf: SampleBuffer): Any =
    new GenericArrayData(buf.map.iterator
      .flatMap { case ((_, _, v), c) => Iterator.fill(c.toInt)(v) }
      .toArray.sorted)

  override def serialize(buf: SampleBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 32 * buf.map.size)
    bb.putInt(buf.k).putInt(buf.map.size)
    buf.map.foreach { case ((h, id, v), c) =>
      bb.putLong(h).putLong(id).putDouble(v).putLong(c): Unit
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SampleBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new SampleBuffer(bb.getInt())
    val entries = bb.getInt()
    var i = 0
    while (i < entries) {
      val (h, id, v) = (bb.getLong(), bb.getLong(), bb.getDouble())
      val c = bb.getLong()
      var j = 0L
      while (j < c) { buf.add(h, id, v); j += 1 }
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

  /** Values of the k rows with the smallest (h, id, value) total-order
    * key per group, sorted ascending (k a literal) — the value is part of
    * the order key (the deterministic-boundary tie-break documented on
    * [[BottomKSample]]), not just a payload. Requires [[register]].
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
