package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `double_order_bits(v) -> bigint`: the IEEE-754 bit pattern of a double
  * remapped so SIGNED long order equals double order (the classic radix-sort
  * key: positives keep their bits, negatives are bit-complemented and
  * recentered). Monotone, total, and zero-cost in codegen — it lets an
  * equi-width-in-bits histogram be built in ONE pass with NO prior min/max
  * scan: `double_order_bits(v) >> s` is an order-preserving bin key whose
  * cardinality is hard-capped at 2^(64-s) regardless of data scale. Used by
  * the percentile selection path (q73) to locate exact order statistics
  * without ever sorting the table.
  */
final case class DoubleOrderBits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "double_order_bits"

  override def nullSafeEval(v: Any): Any =
    DoubleOrderBits.orderBits(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.DoubleOrderBits.orderBits($v);")

  override protected def withNewChildInternal(newChild: Expression): DoubleOrderBits =
    copy(child = newChild)
}

object DoubleOrderBits {
  /** v1 < v2 ⟺ orderBits(v1) < orderBits(v2) (signed), for all non-NaN
    * doubles; -0.0 lands one below +0.0 (consistent either pass, so
    * selection is unaffected).
    */
  def orderBits(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b >= 0) b else ~b ^ java.lang.Long.MIN_VALUE
  }
}
