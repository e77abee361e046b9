package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback — every row pays interpreted lambda dispatch plus an
  * intermediate array allocation. For similarity search the dot product
  * IS the workload (millions of 64-float kernels per query), so this is
  * exactly the case SURVEY.md §4 reserves for a custom `Expression` with
  * `doGenCode`: a tight primitive loop inside whole-stage codegen, no
  * allocations, no virtual calls.
  *
  * Semantics match `aggregate(zip_with(a,b,(x,y)=>double(x)*double(y)),
  * 0d, +)` exactly (index-ordered double accumulation), so results are
  * bit-identical to the HOF formulation the oracle SQL mirrors.
  */
object VectorExprs {

  /** Σ aᵢ·bᵢ over two array<float> or array<double> columns, accumulated
    * in double. Mixed float/double operands are allowed. */
  final case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    private def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> operands, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    private def elemOf(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val xf = elemOf(left) == FloatType
      val yf = elemOf(right) == FloatType
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
        i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        def get(arr: String, e: Expression): String =
          if (elemOf(e) == FloatType) s"(double) $arr.getFloat($i)"
          else s"$arr.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ${get(a, left)} * ${get(b, right)};
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column-API face of [[DotProduct]]. */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def vecNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vecDot(a, a))
  }

  /** cos(a,b) as one fused plan — callers with many pairs per vector
    * should precompute norms once per vector and divide instead. */
  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))
}
