package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Bounded min-heap of the k largest doubles seen — the aggregation
  * buffer of [[KthScore]]. Never holds more than k values, so a
  * partial aggregate (map-side combine) ships k doubles per group
  * regardless of group size.
  */
final class TopKHeap(val k: Int) {
  // binary min-heap in heap(0..size-1): heap(0) is the SMALLEST of the
  // retained top-k, i.e. the running kth-largest once size == k.
  val heap = new Array[Double](k)
  var size = 0

  def add(v: Double): Unit = {
    if (size < k) {
      heap(size) = v
      size += 1
      var i = size - 1
      while (i > 0 && heap((i - 1) / 2) > heap(i)) {
        val p = (i - 1) / 2
        val t = heap(p); heap(p) = heap(i); heap(i) = t
        i = p
      }
    } else if (v > heap(0)) {
      heap(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < k && heap(l) < heap(m)) m = l
        if (r < k && heap(r) < heap(m)) m = r
        if (m == i) done = true
        else {
          val t = heap(m); heap(m) = heap(i); heap(i) = t
          i = m
        }
      }
    }
  }
}

/** kth-largest value (duplicates counted) of a double column, per group —
  * the tie-inclusive top-k THRESHOLD of SURVEY §2 T1/T2 as a custom
  * Catalyst aggregate (reference quickselect: `Algo_Util.java:32-79`; cut
  * semantics: `Forward_Push.java:423-428`, `Fora_Topk.java:193-198`).
  *
  * `score >= kth_score(score, k)` selects exactly the rows that
  * `RANK() OVER (ORDER BY score DESC) <= k` selects — a row ranks ≤ k iff
  * fewer than k rows are strictly greater, iff its score ≥ the kth
  * largest. The scale story is the difference: the window formulation
  * SORTS every group in full on one task, while this aggregate keeps a
  * k-bounded min-heap per group WITH partial aggregation — each map task
  * ships at most k doubles per group across the shuffle, and no sort
  * happens anywhere. Groups smaller than k yield -Infinity (every row
  * passes, matching RANK ≤ k on a short group).
  */
case class KthScore(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ImplicitCastInputTypes {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => require(i > 0, s"kth_score: k must be positive, got $i"); i
    case other => throw new IllegalArgumentException(
      s"kth_score: k must be a foldable INT literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def inputTypes = Seq(DoubleType, IntegerType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kth_score"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buf.add(other.heap(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKHeap): Any =
    if (buf.size < buf.k) Double.NegativeInfinity else buf.heap(0)

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { heap.add(bb.getDouble()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KthScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KthScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KthScore =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** Column + SQL-registry surface for [[KthScore]] (same `call_function`
  * route as [[VectorFunctions]]).
  */
object TopKFunctions {

  /** Per-group kth-largest of `score` (k a literal). Requires [[register]]. */
  def kthScore(score: Column, k: Int): Column =
    call_function("kth_score", score, org.apache.spark.sql.functions.lit(k))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kth_score",
      (children: Seq[Expression]) => KthScore(children.head, children(1)),
      "scala_udf")
}
