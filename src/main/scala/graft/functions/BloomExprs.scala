package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Scale path for the Bloom probe ([[graft.ops.Bloom.mightContain]]).
  *
  * The portable probe embeds the bitset as ONE array literal — perfect up
  * to a couple of MiB, but past [[graft.ops.Bloom.MaxLiteralBits]] a
  * plan-embedded literal becomes the bottleneck (plan serialization,
  * codegen constant pool) long before the filter stops being useful. This
  * expression carries the bitset as a BROADCAST VARIABLE instead: the
  * plan node holds only the broadcast handle, executors fetch the words
  * once per JVM via torrent broadcast, and the probe itself is the same
  * word-index/mask arithmetic, codegen'd into the row loop.
  *
  * Semantics are identical to the literal formulation
  * (`forall(positions, p -> bits[p/64] & mask(p%64) != 0)`), including
  * NULL propagation: a NULL key yields NULL positions, and any NULL
  * element makes the probe NULL (row filtered) — matching `forall` over
  * an array with NULL lambda results.
  */
object BloomExprs {

  /** `bloom_probe(positions)` — true iff every bit position in the input
    * `array<bigint>` is set in the broadcast bitset. */
  final case class BloomProbe(child: Expression, bits: Broadcast[Array[Long]])
      extends UnaryExpression {

    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_probe"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> positions, got ${dt.sql}")
    }

    override def nullable: Boolean = true

    override def nullSafeEval(in: Any): Any = {
      val arr = in.asInstanceOf[ArrayData]
      val w = bits.value
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null // NULL position (NULL key) → NULL
        val pos = arr.getLong(i)
        if ((w((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
        i += 1
      }
      true
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        // the broadcast handle is the only per-plan object; the words
        // array is fetched once per JVM and cached in a mutable slot
        val bc = ctx.addReferenceObj("bloomBits", bits,
          "org.apache.spark.broadcast.Broadcast")
        val words = ctx.addMutableState("long[]", "bloomWords",
          v => s"$v = (long[]) $bc.value();")
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val all = ctx.freshName("all")
        val pos = ctx.freshName("pos")
        s"""
           |int $n = $a.numElements();
           |boolean $all = true;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  long $pos = $a.getLong($i);
           |  if (($words[(int) ($pos >>> 6)] & (1L << (int) ($pos & 63L))) == 0L) {
           |    $all = false; break;
           |  }
           |}
           |${ev.value} = $all;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): BloomProbe =
      copy(child = newChild)
  }
}
