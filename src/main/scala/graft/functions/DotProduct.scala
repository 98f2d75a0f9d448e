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

/** `sorted_intersect_size(a, b)` — number of DISTINCT common values of
  * two ascending-sorted `array<long>` columns, as one merge scan.
  *
  * Semantically `size(array_intersect(a, b))` (which the DuckDB oracle
  * mirrors via `len(list_intersect(...))`), but array_intersect builds
  * a hash set AND materializes the intersection array per row — on a
  * candidate-verify join that is |candidates| set builds for a single
  * integer answer (measured 4.5s for 209k candidate pairs at sf0.1 vs
  * sub-second for the merge). CONTRACT: both inputs must be sorted
  * ascending (duplicates allowed — equal runs count once, matching
  * array_intersect's distinct semantics).
  */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSizeExpr.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectSizeExpr.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSizeExpr {

  /** Referenced from generated code — keep public and static-shaped. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        // skip duplicate runs so equal values count once (distinct
        // semantics of array_intersect)
        val v = x
        while (i < na && a.getLong(i) == v) i += 1
        while (j < nb && b.getLong(j) == v) j += 1
      }
    }
    c
  }

  def sorted_intersect_size(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSizeExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `sorted_intersect(a, b)` — the DISTINCT common values of two
  * ascending-sorted `array<long>` columns, as one merge scan. The
  * element-returning sibling of [[SortedIntersectSizeExpr]] for
  * consumers that need the members themselves (per-vertex triangle
  * crediting), with the same contract (inputs sorted ascending;
  * equal runs emit once) and the same reason to exist:
  * `array_intersect` builds a per-row hash set and pays an
  * interpreted collection path, this is one codegen'd merge that
  * also emits its result already sorted. */
case class SortedIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectExpr.intersect(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectExpr.intersect($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectExpr {

  /** Referenced from generated code — keep public and static-shaped. */
  def intersect(a: ArrayData, b: ArrayData):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        out(c) = x; c += 1
        val v = x
        while (i < na && a.getLong(i) == v) i += 1
        while (j < nb && b.getLong(j) == v) j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, c))
  }

  def sorted_intersect(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
