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

/** Mutable moment buffer for distributed covariance/PCA: row count,
  * per-component sums, and the packed upper-triangle Gram matrix
  * Σ qᵢqⱼ (i ≤ j), all over 1e-3-quantized components
  * (`q = floor(x·1000)` — floor, not round, because IEEE
  * multiply/floor are bit-identical across engines while round's tie
  * mode is not). Exact Long arithmetic end-to-end makes the merge a
  * commutative monoid: the result is bit-identical under ANY
  * partitioning, and a SQL oracle can replay the same integers.
  *
  * Long bounds: |q| ≲ 1e3 for unit-ish embeddings, so Gram terms are
  * ≤ 1e6 per row — exact to ~9e12 rows (Long.MaxValue / 1e6), far past
  * any single covariance group. Sized lazily on first vector.
  */
final class GramSumBuffer {
  var n: Long = 0L
  var dim: Int = 0
  var s: Array[Long] = null
  var g: Array[Long] = null

  def add(v: ArrayData): Unit = {
    val d = v.numElements()
    if (s == null) {
      dim = d
      s = new Array[Long](d)
      g = new Array[Long](d * (d + 1) / 2)
    }
    // a row whose dimension disagrees with the buffer would silently
    // drop components (and a triangle packed at another dim misaligns
    // every row past the first) — corrupt moments are worse than a
    // failed task
    require(d == dim,
      s"gram_sum: embedding dimension changed mid-aggregation " +
        s"($dim then $d) — mixed-dimension input is not foldable")
    val m = math.min(d, dim)
    val q = new Array[Long](m)
    var i = 0
    while (i < m) {
      q(i) = math.floor(v.getFloat(i).toDouble * 1000.0).toLong
      i += 1
    }
    n += 1
    i = 0
    var off = 0
    while (i < m) {
      s(i) += q(i)
      var j = i
      while (j < m) { g(off + (j - i)) += q(i) * q(j); j += 1 }
      off += dim - i
      i += 1
    }
  }

  def merge(o: GramSumBuffer): Unit =
    if (o.s != null) {
      if (s == null) { n = o.n; dim = o.dim; s = o.s; g = o.g }
      else {
        // two triangles packed at different dims have different (row,col)
        // offsets — element-wise addition would silently corrupt every
        // entry past the first row
        require(dim == o.dim,
          s"gram_sum: merging buffers of different dimensions " +
            s"($dim vs ${o.dim}) — mixed-dimension input is not foldable")
        n += o.n
        var i = 0
        while (i < s.length) { s(i) += o.s(i); i += 1 }
        i = 0
        while (i < g.length) { g(i) += o.g(i); i += 1 }
      }
    }
}

/** `gram_sum(array<float>)` → struct<n: bigint, s: array<bigint>,
  * g: array<bigint>>: the one-pass moment reduction behind distributed
  * covariance and PCA. The ONLY corpus-sized work is the narrow scan
  * feeding map-side partials; the exchange carries one
  * O(dim²) buffer per partition and the driver (or the finishing
  * reduce) sees exactly one dim×dim-worth of integers regardless of
  * corpus size — the classic tall-skinny regime where eigendecomposition
  * of the dim×dim result is driver-side noise (O(dim³) ≪ one task).
  */
case class GramSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramSumBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false)),
    StructField("g", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = true

  override def createAggregationBuffer(): GramSumBuffer = new GramSumBuffer

  override def update(buf: GramSumBuffer, input: InternalRow): GramSumBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: GramSumBuffer, other: GramSumBuffer): GramSumBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: GramSumBuffer): Any =
    if (buf.s == null) null
    else InternalRow(buf.n, new GenericArrayData(buf.s), new GenericArrayData(buf.g))

  override def serialize(buf: GramSumBuffer): Array[Byte] = {
    val sn = if (buf.s == null) 0 else buf.s.length
    val gn = if (buf.g == null) 0 else buf.g.length
    val bb = ByteBuffer.allocate(8 + 4 + 4 + 8 * (sn + gn))
    bb.putLong(buf.n)
    bb.putInt(sn)
    bb.putInt(gn)
    var i = 0
    while (i < sn) { bb.putLong(buf.s(i)); i += 1 }
    i = 0
    while (i < gn) { bb.putLong(buf.g(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new GramSumBuffer
    buf.n = bb.getLong()
    val sn = bb.getInt()
    val gn = bb.getInt()
    if (sn > 0) {
      buf.dim = sn
      buf.s = new Array[Long](sn)
      buf.g = new Array[Long](gn)
      var i = 0
      while (i < sn) { buf.s(i) = bb.getLong(); i += 1 }
      i = 0
      while (i < gn) { buf.g(i) = bb.getLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_gram_sum"
}

object GramSumAgg {
  def column(vec: Column): Column =
    Bridge.column(GramSumAgg(Bridge.expression(vec)).toAggregateExpression())
}
