package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mutable element-wise sum buffer (sized lazily on first vector).
  * `elemType` picks the typed ArrayData getter — reading a double array
  * through getFloat would return garbage bits on unsafe rows, silently.
  */
final class VectorSumBuffer {
  var sums: Array[Double] = null
  def add(v: ArrayData, elemType: DataType): Unit = {
    val n = v.numElements()
    if (sums == null) sums = new Array[Double](n)
    val m = math.min(n, sums.length)
    var i = 0
    elemType match {
      case DoubleType =>
        while (i < m) { sums(i) += v.getDouble(i); i += 1 }
      case LongType =>
        while (i < m) { sums(i) += v.getLong(i).toDouble; i += 1 }
      case FloatType =>
        while (i < m) { sums(i) += v.getFloat(i).toDouble; i += 1 }
      case IntegerType =>
        while (i < m) { sums(i) += v.getInt(i).toDouble; i += 1 }
      case other =>
        // an unmatched type falling into a typed getter is the silent-
        // corruption mode this dispatch exists to prevent — fail loudly
        throw new IllegalArgumentException(
          s"graft_vector_sum: unsupported array element type $other")
    }
  }
  def merge(o: VectorSumBuffer): Unit =
    if (o.sums != null) {
      if (sums == null) sums = o.sums
      else {
        val m = math.min(sums.length, o.sums.length)
        var i = 0
        while (i < m) { sums(i) += o.sums(i); i += 1 }
      }
    }
}

/** `vector_sum(array<float>)` → array<double>: element-wise sum, the
  * reduction behind distributed k-means centroid updates. Runs in
  * ObjectHashAggregate with map-side partial sums — the shuffle carries
  * one dim-length buffer per (group, partition), never the vectors.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorSumBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): VectorSumBuffer = new VectorSumBuffer

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"graft_vector_sum expects an array column, got $other")
  }

  override def update(buf: VectorSumBuffer, input: InternalRow): VectorSumBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], elemType)
    buf
  }

  override def merge(buf: VectorSumBuffer, other: VectorSumBuffer): VectorSumBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: VectorSumBuffer): Any =
    if (buf.sums == null) null else new GenericArrayData(buf.sums)

  override def serialize(buf: VectorSumBuffer): Array[Byte] = {
    val n = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new VectorSumBuffer
    if (n > 0) {
      buf.sums = new Array[Double](n)
      var i = 0
      while (i < n) { buf.sums(i) = bb.getDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_vector_sum"
}

object VectorSumAgg {
  def column(vec: Column): Column =
    Bridge.column(VectorSumAgg(Bridge.expression(vec)).toAggregateExpression())
}
