package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch: keeps the k smallest DISTINCT
  * hash values seen — the classic bottom-k estimator (Bar-Yossef et al.;
  * the sketch DataSketches calls "theta"). With an md5-derived hash the
  * whole sketch is DETERMINISTIC: any engine that can sort hashes
  * reproduces the k minima and therefore the estimate BIT-FOR-BIT —
  * which is what lets q101's oracle replay the estimate exactly in SQL
  * (`ORDER BY h LIMIT k`), a hash-exact gate where HLL (q14) could only
  * be gated on its accuracy contract.
  *
  * Distinctness is the point: a bounded top-k of hashes WITH duplicates
  * ([[TopKAgg]]) estimates nothing — the same hot key would fill the
  * buffer. The state here is a TreeSet of ≤ k longs (k ≤ 2^20), set
  * semantics dedupe on insert, partial aggregation runs map-side, and
  * merge is ordinary set-union-then-trim — so the shuffle carries at
  * most tasks×k longs regardless of data volume, and NO distinct
  * (= full key shuffle) ever happens. That is the 100 TB answer to
  * "how many distinct keys, and how many do two tables share": three
  * narrow scans, bounded buffers, exact integer arithmetic.
  *
  * Estimator (computed OUTSIDE the agg, from the returned sorted array):
  * if fewer than k distinct hashes exist the sketch IS the exact set
  * (estimate = its size); else est = (k-1) · 2^60 div h_k with h_k the
  * k-th smallest — integral division, replayed in DuckDB as HUGEINT //.
  * Hash = the 60-bit md5 prefix convention used engine-wide (15 hex
  * chars → positive long); 60-bit collisions between distinct keys are
  * deterministic and identical in both engines, so parity survives them.
  */
final case class KmvAgg(
    hash: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def child: Expression = hash

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def offer(buf: mutable.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf -= buf.last; buf += h }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val h = hash.eval(input)
    if (h != null) offer(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach(offer(a, _))
    a
  }

  /** The ≤ k minima, ascending — the serialized sketch. */
  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt()
    (0 until n).foreach(_ => buf += bb.getLong())
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(hash = newChild)
}

object KmvAgg {
  /** Column face: `kmvSketch(h, k)` → array<long>, the ≤ k smallest
    * distinct values of `h` (a 60-bit non-null hash), ascending. */
  def kmvSketch(hash: Column, k: Int): Column =
    GraftBridge.column(
      KmvAgg(GraftBridge.expression(hash), k).toAggregateExpression())
}
