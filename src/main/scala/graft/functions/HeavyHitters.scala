package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving (Misra–Gries family) heavy-hitters summary: at most
  * `capacity` counters of `(item, count, err)`.
  *
  * Invariants (per summary over n observed items):
  *  - `count` OVERestimates the true frequency by at most `err`
  *    (`true ∈ [count - err, count]`);
  *  - any item with true frequency > n / capacity is present;
  *  - when the stream's distinct-item count never exceeds `capacity`,
  *    no eviction happens and every `count` is EXACT with `err = 0` —
  *    which also makes the result independent of partitioning/merge
  *    order (the property the oracle gate checks; the approximate
  *    regime is order-dependent like every mergeable MG sketch).
  *
  * Eviction replaces a minimum-count entry (ties: lexicographically
  * smallest item, for determinism); the newcomer inherits `min + 1`
  * with `err = min`. Merge adds counts/errors for shared items, keeps
  * others verbatim, then evicts down to capacity, folding each evicted
  * entry's count into the survivors' worst-case error via the classic
  * min-count bound.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  val counts = mutable.HashMap.empty[UTF8String, Long]
  val errs = mutable.HashMap.empty[UTF8String, Long]

  /** O(capacity) scan per eviction — in the saturated regime (distinct
    * items ≫ capacity) that is O(arrivals × capacity) per partition. The
    * classic Stream-Summary linked-counter structure (or a lazy min-heap)
    * makes eviction O(1)/O(log c); kept simple here because the engine's
    * registered uses run capacities ≤ 100 where the scan is noise. Revisit
    * before pointing a 10⁴+-capacity sketch at a high-cardinality stream.
    */
  private def minEntry(): (UTF8String, Long) = {
    var mk: UTF8String = null; var mv = Long.MaxValue
    counts.foreach { case (k, v) =>
      if (v < mv || (v == mv && (mk == null || k.compareTo(mk) < 0))) {
        mk = k; mv = v
      }
    }
    (mk, mv)
  }

  /** `item` may be TRANSIENT (backed by a reused scan row buffer): it is
    * cloned only on first insertion, so the per-occurrence hot path — a
    * hash lookup + counter bump for every already-tracked item — allocates
    * NOTHING. (The previous String-keyed form decoded every occurrence to
    * a Java String: one UTF-16 allocation per row, GC-bound at the 100×
    * sweep's ~50M bigrams.)
    *
    * Contract: callers passing `err > 0` (merge/deserialize replay) must
    * pass OWNED keys — the err-map insert below stores the key as-is.
    * Per-row update() always passes err = 0, so the transient path never
    * inserts its key anywhere un-cloned. (Scala's mutable HashMap keeps
    * the existing key object on value overwrite, so the count bump for a
    * tracked item never captures the transient key either.)
    */
  def add(item: UTF8String, by: Long = 1L, err: Long = 0L): Unit =
    counts.get(item) match {
      case Some(c) =>
        counts(item) = c + by
        if (err > 0) errs(item) = errs.getOrElse(item, 0L) + err
      case None if counts.size < capacity =>
        val own = item.clone()
        counts(own) = by
        if (err > 0) errs(own) = err
      case None =>
        val (mk, mv) = minEntry()
        counts.remove(mk); errs.remove(mk)
        val own = item.clone()
        counts(own) = mv + by
        errs(own) = mv + err
    }

  /** Merge = replay the other summary's entries as WEIGHTED arrivals
    * through the same eviction rule (largest first, for a stable order
    * within a run). An entry displacing a minimum inherits that minimum
    * into its error, exactly like a unit arrival — which preserves the
    * overestimate invariant (`true <= cnt`) across merges; a
    * truncate-after-union merge would silently drop mass and turn counts
    * into underestimates when an evicted item re-enters later.
    */
  def merge(other: SpaceSavingBuffer): Unit =
    other.sorted.foreach { case (k, v, e) => add(k, v, e) }

  /** Entries sorted (count desc, item asc — binary UTF-8 order, which is
    * also what the DuckDB oracle's ORDER BY uses).
    */
  def sorted: Array[(UTF8String, Long, Long)] =
    counts.iterator.map { case (k, v) => (k, v, errs.getOrElse(k, 0L)) }
      .toArray.sortWith { (a, b) =>
        a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0)
      }
}

/** `heavy_hitters(item, capacity)`: array of `struct<item, cnt, err>`
  * sorted (cnt desc, item asc). The partial phase bounds every map task's
  * shuffle contribution to `capacity` counters — corpus-wide term
  * frequency without shuffling the vocabulary.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  // analysis-time failure beats a runtime ClassCastException in update()
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_heavy_hitters requires a string item, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String]) // cloned on insert
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: SpaceSavingBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (k, c, e) =>
      InternalRow(k, c, e) // keys are owned clones — safe to emit directly
    }.toArray[Any])

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = {
    val entries = buffer.sorted
    var bytes = 8
    val encoded = entries.map { case (k, _, _) => k.getBytes }
    encoded.foreach(b => bytes += 4 + b.length + 16)
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.capacity).putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(encoded(i).length).put(encoded(i))
      bb.putLong(entries(i)._2).putLong(entries(i)._3)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val cap = bb.getInt(); val n = bb.getInt()
    val buf = new SpaceSavingBuffer(cap)
    var i = 0
    while (i < n) {
      val len = bb.getInt(); val kb = new Array[Byte](len); bb.get(kb)
      val k = UTF8String.fromBytes(kb)
      val c = bb.getLong(); val e = bb.getLong()
      buf.counts(k) = c
      if (e > 0) buf.errs(k) = e
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_heavy_hitters"
}

object sketch {
  /** Space-saving heavy-hitters Column: array of `struct<item, cnt, err>`
    * sorted (cnt desc, item asc), at most `capacity` entries.
    */
  def heavyHitters(item: Column, capacity: Int): Column =
    Bridge.column(
      HeavyHitters(Bridge.expression(item), capacity).toAggregateExpression())
}
