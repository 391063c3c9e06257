package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch: a `depth × width` grid of counters; an arrival
  * increments one counter per row (independent hash per row), and the
  * frequency estimate for an item is the MIN of its `depth` counters.
  *
  * Invariants (the oracle-checkable contract, cf. Cormode & Muthukrishnan
  * 2005):
  *  - `estimate(x) >= true_count(x)` ALWAYS (counters only ever
  *    over-count — collisions add, never subtract);
  *  - `estimate(x) <= true_count(x) + excess` where each row's expected
  *    excess is `n / width` and the min over `depth` rows concentrates
  *    sharply (Markov per row: `P[excess_row > c·n/width] <= 1/c`,
  *    independent rows multiply).
  *
  * Unlike the Misra–Gries summary ([[SpaceSavingBuffer]]), the grid is a
  * COMMUTATIVE MONOID under element-wise addition: merge order and input
  * partitioning cannot change a single counter, so estimates are exactly
  * reproducible under any parallelism — the property that makes the
  * sketch hash-checkable, not just bounded.
  *
  * Scale: memory is `depth × width` longs (320 KiB at 5×8192) regardless
  * of input cardinality — where an exact `GROUP BY` must shuffle its full
  * key set, the sketch ships one fixed-size partial per map task. The
  * 100 TB use: point-frequency of any term/URL/fingerprint after one
  * pass, no vocabulary materialized anywhere.
  */
final class CountMinBuffer(val depth: Int, val width: Int) {
  val counters = new Array[Long](depth * width)
  var n = 0L // total arrivals (for the eps·n error bound)

  // bit-identical to Kernels.hash64(item, 0x5eed + row), but the item's
  // byte copy is made ONCE per arrival instead of once per depth row —
  // the aggregate's hot path pays depth murmur passes, not depth
  // allocations (the hash VALUES must not change: the sketch is
  // hash-checkable against an oracle replaying the same derivation)
  @inline private def slotFromBytes(bytes: Array[Byte], row: Int): Int = {
    val seed = 0x5eed + row
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, seed)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, seed ^ 0x5bd1e995)
    val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
    row * width + java.lang.Math.floorMod(h, width.toLong).toInt
  }

  def add(item: UTF8String, by: Long = 1L): Unit = {
    val bytes = item.getBytes
    var r = 0
    while (r < depth) { counters(slotFromBytes(bytes, r)) += by; r += 1 }
    n += by
  }

  def merge(other: CountMinBuffer): Unit = {
    var i = 0
    while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
    n += other.n
  }

  def estimate(item: UTF8String): Long = {
    val bytes = item.getBytes
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counters(slotFromBytes(bytes, r))
      if (c < est) est = c
      r += 1
    }
    est
  }
}

/** `count_min_estimates(item, queryItems, depth, width)`: one pass over
  * `item`, then for each of the FIXED `queryItems` emits
  * `struct<item, est, n>` (`n` = total arrivals, the scale of the
  * `eps·n` bound). Query items ride in the expression — the output is
  * bounded by `|queryItems|`, never by input cardinality.
  */
case class CountMinEstimates(
    child: Expression,
    queryItems: Seq[String],
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinBuffer] with UnaryLike[Expression] {

  require(depth > 0 && width > 0, s"depth/width must be positive: $depth x $width")
  require(queryItems.nonEmpty, "count_min_estimates needs at least one query item")

  private lazy val queryUtf8 = queryItems.map(UTF8String.fromString).toArray

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_count_min requires a string item, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CountMinBuffer =
    new CountMinBuffer(depth, width)

  override def update(buffer: CountMinBuffer, input: InternalRow): CountMinBuffer = {
    val v = child.eval(input)
    // hash64 reads the bytes in place — transient scan-backed values are fine
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: CountMinBuffer, other: CountMinBuffer): CountMinBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: CountMinBuffer): Any =
    new GenericArrayData(queryUtf8.map(q =>
      InternalRow(q, buffer.estimate(q), buffer.n)).toArray[Any])

  override def serialize(buffer: CountMinBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + 8 * buffer.counters.length)
    bb.putInt(buffer.depth).putInt(buffer.width).putLong(buffer.n)
    buffer.counters.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CountMinBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt(); val w = bb.getInt()
    val buf = new CountMinBuffer(d, w)
    buf.n = bb.getLong()
    var i = 0
    while (i < buf.counters.length) { buf.counters(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinEstimates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinEstimates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_count_min"
}

object countmin {
  /** Count–Min point-frequency estimates Column: array of
    * `struct<item, est, n>`, one entry per query item, in query order.
    */
  def countMinEstimates(item: Column, queryItems: Seq[String],
      depth: Int = 5, width: Int = 8192): Column =
    Bridge.column(
      CountMinEstimates(Bridge.expression(item), queryItems, depth, width)
        .toAggregateExpression())
}
