package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass Gram/scatter-matrix aggregate (q120): `gram_upper(vec, d)`
  * folds every d-dim vector's outer product into the upper triangle of
  * Σ xᵢxⱼ — the d·(d+1)/2-long buffer that IS the unnormalized
  * covariance/PCA input (covariance = Gram of centered vectors; the
  * mean vector is a cheap second output of the same scan). Inputs are
  * the suite's int8-quantized embeddings carried as exact-integer
  * doubles, accumulated in longs, so the matrix is exact and engine-
  * portable (every partial is an integer; no FP summation-order term).
  *
  * This is the "wide but bounded" aggregate shape: the buffer is
  * d(d+1)/2 longs per partial (d=64 → 2080 longs = 16 KB), update is a
  * tight d²/2 multiply-add loop with NO per-row allocation (the q92
  * lesson: a higher-order-function formulation allocates a fresh array
  * per row and its churn becomes the growth term), and partials merge
  * element-wise map-side — at 100 TB the shuffle carries tasks×16 KB,
  * never a row. The d² explode-and-groupBy formulation (what the
  * DuckDB oracle runs) shuffles n·d²/2 rows instead; the agg is the
  * plan that survives the scale-up.
  *
  * Row-major upper-triangle layout: idx(i,j) = i·d − i(i−1)/2 + (j−i),
  * the same order `flatten(transform(sequence...))` generates on the
  * read side, so unpacking is positional.
  */
final case class GramAgg(
    child: Expression,
    d: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val len = d * (d + 1) / 2

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_upper expects array<double>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"gram_upper(d=$d) got a ${arr.numElements()}-element vector")
      // pull once into a primitive local: exact ints carried as doubles.
      // A null ELEMENT would otherwise read as 0.0 silently (unsafe-row
      // semantics) and corrupt the matrix — fail loud instead.
      val x = new Array[Long](d)
      var i = 0
      while (i < d) {
        require(!arr.isNullAt(i), s"gram_upper: null element at index $i")
        x(i) = arr.getDouble(i).toLong
        i += 1
      }
      var idx = 0
      i = 0
      while (i < d) {
        val xi = x(i)
        var j = i
        while (j < d) { buf(idx) += xi * x(j); idx += 1; j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * len)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(len)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_upper"

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(child = newChild)
}

object GramAgg {
  /** Column face: `gramUpper(col("q8"), 64)`. */
  def gramUpper(c: Column, d: Int): Column =
    GraftBridge.column(
      GramAgg(GraftBridge.expression(c), d).toAggregateExpression())
}
