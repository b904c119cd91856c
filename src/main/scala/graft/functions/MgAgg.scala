package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, IntegerType, LongType, StructType}

import graft.operators.MisraGries

/** Misra-Gries frequent-items summary as a custom Catalyst aggregate:
  * ≤ k (key, lowerBound) counters of state per group however many rows
  * arrive — the frequent-ITEMS member of the bounded-state sketch family
  * ([[KmvKth]] cardinality, CMS point-frequency, HLL registers,
  * [[BottomKSample]] percentiles). Partial aggregation ships ≤ k pairs
  * per group; merges use the mergeable-summaries rule (see
  * [[MisraGries.merge]]), which preserves the no-false-negative
  * GUARANTEE for any merge tree while the exact counter values are
  * merge-order-dependent — so the streaming twin's spec pins properties
  * (superset, bounds, state size), plus full equality in the
  * k ≥ distinct-keys regime where no cancellation fires and the summary
  * IS the exact count table.
  *
  * Output: array of (bucket, lb) structs sorted ascending by bucket —
  * a canonical presentation so equal SUMMARIES compare equal as values.
  */
case class MisraGriesAgg(
    keyExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries] with ImplicitCastInputTypes {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int =>
      require(i > 0, s"misra_gries: k must be positive, got $i"); i
    case other => throw new IllegalArgumentException(
      s"misra_gries: k must be a foldable INT literal, got $other")
  }

  override def children: Seq[Expression] = Seq(keyExpr, kExpr)
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = ArrayType(
    new StructType()
      .add("bucket", DataTypes.LongType, nullable = false)
      .add("lb", DataTypes.LongType, nullable = false),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MisraGries = new MisraGries(k)

  override def update(buf: MisraGries, input: InternalRow): MisraGries = {
    val key = keyExpr.eval(input)
    if (key != null) buf.add(key.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MisraGries, other: MisraGries): MisraGries = {
    buf.merge(other)
    buf
  }

  override def eval(buf: MisraGries): Any =
    new GenericArrayData(buf.entries.toArray.sortBy(_._1)
      .map { case (b, lb) => InternalRow(b, lb) })

  override def serialize(buf: MisraGries): Array[Byte] = {
    val es = buf.entries.toArray
    val bb = ByteBuffer.allocate(16 + 16 * es.length)
    bb.putInt(buf.k).putInt(es.length).putLong(buf.processed)
    es.foreach { case (kk, v) => bb.putLong(kk).putLong(v): Unit }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGries = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MisraGries(bb.getInt())
    val entries = bb.getInt()
    val total = bb.getLong()
    var i = 0
    while (i < entries) {
      buf.put(bb.getLong(), bb.getLong())
      i += 1
    }
    buf.setProcessed(total)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(keyExpr = newChildren(0), kExpr = newChildren(1))
}

/** Column + SQL-registry surface for [[MisraGriesAgg]]. */
object MgFunctions {

  /** Misra-Gries summary of `key` with `k` counters (k a literal):
    * array of (bucket, lb) structs sorted by bucket. Requires
    * [[register]].
    */
  def misraGries(key: Column, k: Int): Column =
    call_function("misra_gries", key,
      org.apache.spark.sql.functions.lit(k))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries",
      (children: Seq[Expression]) => MisraGriesAgg(children.head, children(1)),
      "scala_udf")
}
