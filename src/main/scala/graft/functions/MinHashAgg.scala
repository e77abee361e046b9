package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregate (SURVEY.md §4's
  * TypedImperativeAggregate stretch): `minhash_sig(shingle, k)` returns
  * the k-component signature as array<long> from a single pass over the
  * shingles — versus k separate `min(hash_i(...))` aggregates, this
  * hashes each input twice (xxhash64 seeds) and derives the k values as
  * h1 + i·h2 (the standard double-hashing minwise family), updating one
  * primitive long buffer.
  *
  * Scale: the buffer is k longs per group (k=32 → 256 bytes), partial
  * aggregation merges element-wise mins map-side, and the input is
  * consumed streaming — the canonical sketch-aggregate shape.
  */
final case class MinHashAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val h1 = XxHash64Function.hash(s, StringType, 42L)
      val h2 = XxHash64Function.hash(s, StringType, 0x9e3779b9L) | 1L // odd → full-period
      var i = 0
      var h = h1
      while (i < k) {
        if (h < buf(i)) buf(i) = h
        h += h2
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Column face: `minhashSig(col("shingle"), 32)`. */
  def minhashSig(c: Column, k: Int): Column =
    GraftBridge.column(
      MinHashAgg(GraftBridge.expression(c), k).toAggregateExpression())
}
