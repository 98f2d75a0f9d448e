package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two `array<long>` vectors as a native
  * Catalyst expression.
  *
  * The composable formulation `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * is semantically identical but runs the lambda through Spark's
  * interpreted higher-order-function path — per element, per pair. On
  * the brute-force top-k join that is |pairs|·dim interpreted calls
  * (measured: 34s for 4M pairs × 64 dims at sf0.1). This expression is
  * one tight codegen'd loop and keeps the whole pair pipeline inside
  * whole-stage codegen.
  */
case class DotProductLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductLongExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductLongExpr.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductLongExpr {
  /** Referenced from generated code — keep public and static-shaped.
    * Vectors of unequal length pair up to the shorter one (matches
    * `zip_with` null-free semantics for the equal-length case). */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  def dot_long(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductLongExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
