package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash over an array of per-token hashes: for each bit position,
  * count +1/-1 votes across the tokens; the fingerprint sets the bits
  * whose vote is positive. Near-identical documents differ in few bits
  * (small Hamming distance) — the classic Charikar scheme used for
  * web-scale near-dup detection.
  *
  * A native Catalyst expression (one pass over the hash array, no
  * per-bit column blowup) rather than 30 separate aggregate columns:
  * the 30-column formulation is what the DuckDB oracle mirrors, but in
  * the Spark hot path it would bloat the expression tree and spill out
  * of whole-stage codegen.
  *
  * Bit width is 30 because the token hashes are `rolling_hash` values
  * mod 1e9+7 < 2^30 — higher bits carry no signal.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {
  val NumBits = 30

  /** Referenced from generated code — keep public and static-shaped. */
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](NumBits)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < NumBits) {
        counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < NumBits) {
      if (counts(b) > 0) packed |= (1L << b)
      b += 1
    }
    packed
  }

  def simhash(hashes: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(hashes)))
}
