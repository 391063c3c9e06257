package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mutable (offset, value) pair for [[LatestByOffsetAgg]]. */
final class LatestBuffer {
  var set: Boolean = false
  var offset: Long = Long.MinValue
  var value: Any = null
}

/** `latest_by_offset(value, order)` — the reference's LATEST_BY_OFFSET
  * (all.sql:136-137) as a native aggregate.
  *
  * Spark's built-in `max_by` is a declarative aggregate whose buffer
  * holds the candidate value; a non-primitive value type (string, struct)
  * disqualifies it from HashAggregate, so every max_by plan degrades to
  * SortAggregate with a per-partition sort on the grouping key — CPU
  * O(n log n) per partition at 100 TB. This TypedImperativeAggregate
  * keeps one (long, value) pair per group and executes in
  * ObjectHashAggregate: hash-based, no sorts, map-side partial reduction
  * before the exchange.
  *
  * Tie behavior: strictly-greater order wins, so the first-seen value is
  * kept on equal offsets (offsets are unique in the engine's usage —
  * Kafka offsets / insertion ordinals).
  */
case class LatestByOffsetAgg(
    value: Expression,
    order: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LatestBuffer] with BinaryLike[Expression] {

  override def left: Expression = value
  override def right: Expression = order

  // update() narrows the order value through java.lang.Number — a string
  // or decimal order column must fail ANALYSIS, not CCE on the first row
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    order.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_latest_by_offset requires an integral order column " +
            s"(the offset), got ${other.sql}")
    }

  override def dataType: DataType = value.dataType
  override def nullable: Boolean = true

  @transient private lazy val serProjection =
    UnsafeProjection.create(Array[DataType](BooleanType, LongType, value.dataType))
  @transient private lazy val serRow = new UnsafeRow(3)

  override def createAggregationBuffer(): LatestBuffer = new LatestBuffer

  override def update(buf: LatestBuffer, input: InternalRow): LatestBuffer = {
    val o = order.eval(input)
    if (o != null) {
      val off = o.asInstanceOf[Number].longValue()
      if (!buf.set || off > buf.offset) {
        buf.set = true
        buf.offset = off
        buf.value = InternalRow.copyValue(value.eval(input))
      }
    }
    buf
  }

  override def merge(buf: LatestBuffer, other: LatestBuffer): LatestBuffer = {
    if (other.set && (!buf.set || other.offset > buf.offset)) {
      buf.set = true; buf.offset = other.offset; buf.value = other.value
    }
    buf
  }

  override def eval(buf: LatestBuffer): Any = if (buf.set) buf.value else null

  override def serialize(buf: LatestBuffer): Array[Byte] =
    serProjection(InternalRow(buf.set, buf.offset, buf.value))
      .copy().getBytes

  override def deserialize(bytes: Array[Byte]): LatestBuffer = {
    val buf = new LatestBuffer
    serRow.pointTo(bytes, bytes.length)
    buf.set = serRow.getBoolean(0)
    buf.offset = serRow.getLong(1)
    buf.value =
      if (serRow.isNullAt(2)) null
      else InternalRow.copyValue(serRow.get(2, value.dataType))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LatestByOffsetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LatestByOffsetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(value = newLeft, order = newRight)
  override def prettyName: String = "graft_latest_by_offset"
}

object LatestByOffsetAgg {
  def column(value: Column, order: Column): Column =
    Bridge.column(
      LatestByOffsetAgg(Bridge.expression(value), Bridge.expression(order))
        .toAggregateExpression())
}
