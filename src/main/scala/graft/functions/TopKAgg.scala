package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-group top-k aggregate: keeps the `cap` entries with the
  * SMALLEST (rank, id) pairs seen in the group and returns their ids,
  * sorted by that order. `top_k_by_rank(md5(id), id, cap)` is the
  * skew-immune form of `row_number() OVER (PARTITION BY key ORDER BY
  * rank) <= cap`:
  *
  *  - the window plan shuffles EVERY row of the hot key to one task and
  *    sorts it — a 1B-row domain under a per-domain cap is a straggler
  *    (or an OOM) at 100 TB;
  *  - this aggregate's state is <= cap entries per group NO MATTER the
  *    group size, and partial aggregation runs map-side, so each map
  *    task forwards at most cap entries per key it saw — the shuffle
  *    volume is min(rows, tasks*cap) per key, and the reduce side merges
  *    bounded buffers.
  *
  * Rank is a string compared bytewise (UTF8String binary order); with an
  * md5 hex rank this is a deterministic uniform draw both engines replay
  * (DuckDB: ORDER BY md5(CAST(id AS VARCHAR)), id), so the cap is an
  * UNBIASED per-key subsample, not a "first rows win" artifact.
  */
final case class TopKAgg(
    rank: Expression,
    id: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(UTF8String, Long)]]
    with BinaryLike[Expression] {

  require(cap > 0 && cap <= (1 << 20), s"cap must be in [1, 2^20], got $cap")

  override def left: Expression = rank
  override def right: Expression = id

  // max-heap on (rank, id): head is the WORST kept entry, evicted first
  private val ord: Ordering[(UTF8String, Long)] = new Ordering[(UTF8String, Long)] {
    override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
      val c = a._1.compareTo(b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(UTF8String, Long)] =
    mutable.PriorityQueue.empty[(UTF8String, Long)](ord)

  private def offer(buf: mutable.PriorityQueue[(UTF8String, Long)],
                    r: UTF8String, i: Long): Unit = {
    if (buf.size < cap) {
      buf.enqueue((r.clone(), i)) // clone: eval may return a row-backed view
    } else if (ord.lt((r, i), buf.head)) {
      buf.dequeue()
      buf.enqueue((r.clone(), i))
    }
  }

  override def update(buf: mutable.PriorityQueue[(UTF8String, Long)],
                      input: InternalRow): mutable.PriorityQueue[(UTF8String, Long)] = {
    val r = rank.eval(input)
    val i = id.eval(input)
    if (r != null && i != null) {
      offer(buf, r.asInstanceOf[UTF8String], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(UTF8String, Long)],
                     b: mutable.PriorityQueue[(UTF8String, Long)]): mutable.PriorityQueue[(UTF8String, Long)] = {
    b.foreach { case (r, i) => offer(a, r, i) }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(UTF8String, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(ord).map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(UTF8String, Long)]): Array[Byte] = {
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

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(UTF8String, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt()
    (0 until n).foreach { _ =>
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      buf.enqueue((UTF8String.fromBytes(b), bb.getLong()))
    }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_rank"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TopKAgg =
    copy(rank = newLeft, id = newRight)
}

object TopKAgg {
  /** Column face: `topKByRank(md5(id), id, cap)` → array<long> of the
    * cap ids with the smallest (rank, id), in that order. */
  def topKByRank(rank: Column, id: Column, cap: Int): Column =
    GraftBridge.column(
      TopKAgg(GraftBridge.expression(rank), GraftBridge.expression(id), cap)
        .toAggregateExpression())
}
