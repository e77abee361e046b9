package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch (the 6th sketch family, after
  * HLL++/CMS/portable-HLL/GK-quantiles/KMV): at most `capacity` counters
  * no matter the stream, with the classic deterministic guarantees after
  * ANY order of updates and merges (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS 2012):
  *
  *   - underestimate:  est(x) <= f(x) for every item x;
  *   - bounded error:  est(x) >= f(x) - N/(capacity+1), N = stream size;
  *   - guaranteed hit: every x with f(x) > N/(capacity+1) HAS a counter.
  *
  * The counter VALUES are order-dependent (which partition saw which
  * rows), so unlike KMV this sketch cannot be gated hash-exact; the
  * guarantees above are order-INdependent, which is what q104 gates on
  * (the q14 accuracy-contract convention, but with a theorem rather than
  * a probabilistic envelope behind it — the flags are deterministically
  * true for a correct implementation).
  *
  * Scale: state is <= capacity (key, count) entries per group; partial
  * aggregation runs map-side, so the shuffle carries tasks x capacity
  * entries at ANY data volume — the heavy-hitter answer with no word
  * shuffle. The decrement-all step on a full buffer is O(capacity) but
  * amortized O(1): each decrement round pays down capacity+1 prior
  * increments. Merge = pointwise sum, then if over capacity subtract the
  * (capacity+1)-th largest count from all and drop the non-positive —
  * the PODS-2012 merge that preserves the N/(capacity+1) bound.
  */
final case class MgAgg(
    key: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(capacity > 0 && capacity <= (1 << 16),
    s"capacity must be in [1, 2^16], got $capacity")

  override def child: Expression = key

  // declared input contract: update() casts the child's value straight to
  // UTF8String, so a non-string child must fail at ANALYSIS, not as an
  // executor-side ClassCastException (AbstractDataType is private[sql],
  // so checkInputDataTypes rather than ExpectsInputTypes)
  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_sketch requires a STRING key, got ${key.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty[UTF8String, Long]

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val k = key.eval(input)
    if (k != null) {
      val u = k.asInstanceOf[UTF8String]
      buf.get(u) match {
        case Some(c) => buf.update(u, c + 1)
        case None if buf.size < capacity => buf.update(u.clone(), 1L)
        case None => // decrement-all; drop zeros (amortized O(1))
          val dead = buf.iterator.filter(_._2 == 1L).map(_._1).toArray
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
                     b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (k, c) =>
      a.get(k) match {
        case Some(c0) => a.update(k, c0 + c)
        case None => a.update(k, c)
      }
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from every counter
      val counts = a.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val dead = a.iterator.filter(_._2 <= sub).map(_._1).toArray
      dead.foreach(a.remove)
      a.mapValuesInPlace((_, c) => c - sub)
    }
    a
  }

  /** map<string, long> of the surviving counters. Iteration order of the
    * map value is engine-internal; consumers look entries up by key
    * (map_contains_key / element_at), never by position. */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray.sortBy { case (k, c) => (-c, k.toString) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val bytes = entries.map(_._1.getBytes)
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { j =>
      bb.putInt(bytes(j).length)
      bb.put(bytes(j))
      bb.putLong(entries(j)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt()
    (0 until n).foreach { _ =>
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(UTF8String.fromBytes(b), bb.getLong())
    }
    buf
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): MgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgAgg =
    copy(key = newChild)
}

object MgAgg {
  /** Column face: `mg_sketch(key, capacity)` → map<string,long> of at
    * most `capacity` counters obeying the Misra–Gries bounds. */
  def mgSketch(key: Column, capacity: Int): Column =
    GraftBridge.column(
      MgAgg(GraftBridge.expression(key), capacity).toAggregateExpression())
}
