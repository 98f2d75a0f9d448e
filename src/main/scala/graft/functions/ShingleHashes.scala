package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text, n)` — the rolling hashes of the DISTINCT word
  * n-gram shingles of the lowercased text, in one native pass.
  *
  * Semantically identical to the composable pipeline
  * `transform(array_distinct(<n-grams of split(lower(text),"\\s+")>),
  * rolling_hash)` (which the DuckDB oracle mirrors), but evaluated as
  * one generated-code call instead of three interpreted higher-order
  * functions per document — measured 3.5s → sub-second for 5000 docs'
  * shingling at sf0.1. Parity details that MUST hold for the oracle:
  *   - tokens = `split("\\s+", -1)` (leading empty token kept, like
  *     Spark's `split`/DuckDB's `string_split_regex`);
  *   - texts with fewer than n tokens yield ONE shingle of all tokens;
  *   - dedup is on the shingle STRING (not its hash), matching
  *     `list_distinct` — a within-document hash collision must not
  *     shrink the set;
  *   - hash = [[RollingHashExpr]] over codepoints of the
  *     space-joined shingle.
  */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashesExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashesExpr {

  /** Referenced from generated code — keep public and static-shaped.
    * Takes UTF8String directly: the codegen call site already holds
    * one, and a String parameter would force two full copies of every
    * document per evaluation (toString here, fromString inside). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // lowercase via Spark's own UTF8String implementation — bit-exact
    // with the `lower()` the composable pipeline / oracle uses (a Java
    // toLowerCase would diverge on locale-sensitive chars, e.g. tr-TR)
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val count = math.max(toks.length - (n - 1), 1)
    // dedup on the shingle string, preserving first-occurrence order
    val seen = new java.util.LinkedHashSet[String](count * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = RollingHashExpr.hash(it.next(),
        RollingHashExpr.DefaultBase, RollingHashExpr.DefaultMod)
      k += 1
    }
    new GenericArrayData(out)
  }

  def shingle_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(text), n))
}

/** `token_hashes(text)` — the rolling hash of EVERY whitespace token
  * of the lowercased text (NOT deduplicated — multiplicity carries
  * signal for SimHash voting), in one native pass.
  *
  * Semantically identical to
  * `transform(split(lower(text), "\\s+"), rolling_hash)` (which the
  * DuckDB oracle mirrors definitionally), but one generated-code call
  * instead of an INTERPRETED lambda per token — the HOF `transform`
  * does not participate in codegen and was measured at ~9s for 5000
  * documents' simhash at sf0.1; this expression brings the same
  * computation under one second. Tokenization parity with
  * [[ShingleHashesExpr]]: UTF8String lowercase + `split("\\s+", -1)`.
  */
case class TokenHashesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override def nullSafeEval(input: Any): Any =
    TokenHashesExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenHashesExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHashesExpr {

  /** Referenced from generated code — keep public and static-shaped.
    * UTF8String parameter: see [[ShingleHashesExpr.compute]]. */
  def compute(text: UTF8String): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = RollingHashExpr.hash(toks(i),
        RollingHashExpr.DefaultBase, RollingHashExpr.DefaultMod)
      i += 1
    }
    new GenericArrayData(out)
  }

  def token_hashes(text: Column): Column =
    ColumnBridge.column(TokenHashesExpr(ColumnBridge.expression(text)))
}

/** `top_ngram_count(text, n)` — the multiplicity of the MOST FREQUENT
  * word n-gram of the lowercased text (n-grams compared by their
  * rolling hash), in one native pass. The Gopher-style repetition
  * filter's core statistic (top-bigram fraction = this / (tokens-n+1)).
  *
  * Computing this relationally costs two cluster-wide exchanges for a
  * document-LOCAL number: explode every n-gram of the corpus, groupBy
  * (doc, gram), groupBy (doc) — at 100 TB that ships the entire token
  * stream through two shuffles. This expression keeps it a per-row
  * projection: hash each n-gram (same [[RollingHashExpr]] as the
  * shingle/dedup family, so the DuckDB oracle mirrors it by counting
  * `rh(gram)` groups), sort the per-document hash array, and take the
  * longest equal run — zero exchanges at any scale.
  *
  * Parity contract with the oracle (and [[ShingleHashesExpr]]):
  * UTF8String lowercase, `split("\\s+", -1)` tokens, space-joined
  * n-grams WITH multiplicity (no dedup). Multiplicity is counted per
  * HASH — an (astronomically rare) within-document collision merges
  * two gram groups on BOTH the engine and oracle side identically.
  * Texts with fewer than n tokens have no complete n-gram and yield 0.
  */
case class TopNgramCountExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "top_ngram_count"

  override def nullSafeEval(input: Any): Any =
    TopNgramCountExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TopNgramCountExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopNgramCountExpr {

  /** Referenced from generated code — keep public and static-shaped. */
  def compute(text: UTF8String, n: Int): Long = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val m = toks.length - (n - 1)
    if (m <= 0) return 0L
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      hs(i) = RollingHashExpr.hash(sb.toString,
        RollingHashExpr.DefaultBase, RollingHashExpr.DefaultMod)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var best = 1L
    var run = 1L
    var k = 1
    while (k < m) {
      if (hs(k) == hs(k - 1)) {
        run += 1
        if (run > best) best = run
      } else run = 1L
      k += 1
    }
    best
  }

  def top_ngram_count(text: Column, n: Int): Column =
    ColumnBridge.column(TopNgramCountExpr(ColumnBridge.expression(text), n))
}

/** `minhash_sig(hashes)` — the k-component MinHash signature of an
  * `array<long>` in one native pass (k affine permutations
  * `(a_i*h + b_i) mod P`, tracking all k minima simultaneously),
  * replacing k interpreted `array_min(transform(...))` scans. */
case class MinHashSigExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {

  /** The canonical affine-permutation family (a_i, b_i); a < 2^30 so
    * a*h < 2^60 — no Long overflow. `Dedup.Coeffs` aliases this and
    * the DuckDB oracle SQL is generated from it. */
  val Coeffs: Seq[(Long, Long)] = Seq(
    (387420489L, 12582917L),
    (268435399L, 87178291L),
    (536870909L, 479001599L),
    (999999937L, 321534781L),
    (433494437L, 198491317L),
    (786433213L, 54018521L),
    (920419823L, 370248451L),
    (715827881L, 145601253L))

  val Mod: Long = RollingHashExpr.DefaultMod

  private val A: Array[Long] = Coeffs.map(_._1).toArray
  private val B: Array[Long] = Coeffs.map(_._2).toArray

  /** Referenced from generated code — keep public and static-shaped.
    * Empty input yields Long.MaxValue components (never occurs for
    * shingle input, which is always non-empty). */
  def compute(hs: ArrayData): ArrayData = {
    val k = A.length
    val mins = Array.fill(k)(Long.MaxValue)
    val len = hs.numElements()
    var i = 0
    while (i < len) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val x = (h * A(j) + B(j)) % Mod
        if (x < mins(j)) mins(j) = x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhash_sig(hashes: Column): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(hashes)))
}
