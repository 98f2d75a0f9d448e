package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's Unicode codepoints:
  * `h = fold(cp => (h * base + cp) mod m)` — the document-fingerprint
  * primitive for the training-data pipeline (content-defined chunking /
  * cheap near-identity checks).
  *
  * A native Catalyst expression rather than a Scala UDF or
  * `functions.aggregate(split(text, ""))`: one pass over the string, no
  * per-character array materialization, no higher-order-function
  * interpretation — it stays inside whole-stage codegen via a static
  * call, which is the difference between a scan-speed op and a
  * bottleneck at 100 TB of text.
  */
case class RollingHashExpr(child: Expression, base: Int, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHashExpr.hash(input.asInstanceOf[UTF8String].toString, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashExpr.hash($c.toString(), $base, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashExpr {
  /** Referenced from generated code — keep public and static-shaped. */
  def hash(s: String, base: Int, mod: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  val DefaultBase = 31
  val DefaultMod = 1000000007L

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(
      RollingHashExpr(ColumnBridge.expression(c), DefaultBase, DefaultMod))
}
