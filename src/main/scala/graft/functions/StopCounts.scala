package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `stop_counts(text, lists)` — for K stopword lists, the number of
  * whitespace tokens of the lowercased text contained in each list
  * (with multiplicity), as one native pass returning `array<int>`.
  *
  * Semantically `size(filter(split(lower(text), "\\s+"),
  * t => array_contains(list_k, t)))` per list (the formulation the
  * DuckDB oracle mirrors via `len(list_filter(...))`), but those K
  * higher-order filters run an INTERPRETED lambda per token per list —
  * and being K distinct expressions they can't share the tokenization
  * either. One fused pass tokenizes once and tests each token against
  * K hash sets; used K+1 times in a projection (language ID + quality
  * score) it also collapses to a single evaluation via Spark's
  * subexpression elimination, because equal case-class instances
  * compare equal.
  *
  * Tokenization parity with [[TokenHashesExpr]]/[[ShingleHashesExpr]]:
  * UTF8String lowercase + `split("\\s+", -1)`.
  */
case class StopCountsExpr(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stop_counts"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    StopCountsExpr.buildSets(lists)

  override def nullSafeEval(input: Any): Any =
    StopCountsExpr.compute(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StopCountsExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StopCountsExpr {

  private[functions] def buildSets(
      lists: Seq[Seq[String]]): Array[java.util.HashSet[String]] =
    lists.map { ws =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(s.add)
      s
    }.toArray

  /** Referenced from generated code — keep public and static-shaped.
    * UTF8String parameter: the codegen call site already holds one; a
    * String parameter would copy the document twice per evaluation. */
  def compute(text: UTF8String,
              sets: Array[java.util.HashSet[String]]): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var k = 0
      while (k < sets.length) {
        if (sets(k).contains(t)) counts(k) += 1
        k += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  def stop_counts(text: Column, lists: Seq[Seq[String]]): Column =
    ColumnBridge.column(StopCountsExpr(ColumnBridge.expression(text), lists))
}
