package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_apply(syms, rules)` — apply an ORDERED BPE merge-rule list to
  * a symbol array: for each rule (l, r → m) in rank order, one greedy
  * left-to-right pass replaces adjacent (l, r) with m, exactly the
  * semantics of the per-rule `aggregate` HOF fold it replaces.
  *
  * Why native: the composable fold runs Spark's interpreted
  * higher-order-function path per rule per row — an 8-rule encode is
  * 8 interpreted lambda passes, each allocating a fresh Catalyst
  * array per element append. This expression applies ALL rules in one
  * codegen'd call with a single in-place buffer (the write pointer
  * never passes the read pointer, so each pass compacts in place),
  * keeping the vocabulary projection inside whole-stage codegen.
  * The rule list is bound at plan time (it is driver-side data — the
  * learned merge table), shipped via a codegen reference object.
  */
case class BpeApplyExpr(child: Expression,
                        rules: Seq[(UTF8String, UTF8String, UTF8String)])
    extends UnaryExpression {

  // rules is a Seq of tuples, NOT Array[Array[_]] (r12 advice): array
  // equality is reference-based, so the Array form made two
  // semantically identical expressions never compare equal —
  // canonicalization / semanticEquals / common-subexpression
  // elimination all silently missed. Seq+tuple equality is structural
  // (UTF8String.equals is value-based). The eval/codegen sides bind
  // the flat array form once, here.
  @transient private lazy val ruleArr: Array[Array[UTF8String]] =
    rules.map { case (l, r, m) => Array(l, r, m) }.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  override def nullSafeEval(a: Any): Any =
    BpeApplyExpr.applyRules(a.asInstanceOf[ArrayData], ruleArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rulesRef = ctx.addReferenceObj("bpeRules", ruleArr,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeApplyExpr.applyRules($c, $rulesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeApplyExpr {

  /** Referenced from generated code — keep public and static-shaped. */
  def applyRules(a: ArrayData,
                 rules: Array[Array[UTF8String]]): GenericArrayData = {
    var n = a.numElements()
    val buf = new Array[AnyRef](n)
    var i = 0
    while (i < n) { buf(i) = a.getUTF8String(i); i += 1 }
    var k = 0
    while (k < rules.length) {
      val l = rules(k)(0); val r = rules(k)(1); val m = rules(k)(2)
      var c = 0
      i = 0
      while (i < n) {
        val x = buf(i)
        if (c > 0 && buf(c - 1) == l && x == r) buf(c - 1) = m
        else { buf(c) = x; c += 1 }
        i += 1
      }
      n = c
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, n))
  }

  def bpe_apply(syms: Column,
                merges: Seq[(String, String, String)]): Column = {
    val rules = merges.map { case (l, r, m) =>
      (UTF8String.fromString(l), UTF8String.fromString(r),
        UTF8String.fromString(m))
    }
    ColumnBridge.column(BpeApplyExpr(ColumnBridge.expression(syms), rules))
  }
}
