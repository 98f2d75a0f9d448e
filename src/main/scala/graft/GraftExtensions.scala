package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/** SQL surface for graft's native expressions.
  *
  * Two equivalent entry points:
  *  - config-driven: `spark.sql.extensions=graft.GraftExtensions`
  *    (the SparkSessionExtensions route — works for plain SQL users
  *    with no Scala imports);
  *  - imperative: `GraftExtensions.register(spark)` on an existing
  *    session.
  *
  * After either, `spark.sql("SELECT rolling_hash(text), ...")` works —
  * `rolling_hash`, `simhash`, `shingle_hashes(text, n)`,
  * `minhash_sig`, `dot_long`, `token_hashes`,
  * `sorted_intersect_size`, `top_ngram_count(text, n)`, and the
  * aggregate `top_k_by_sim(sim, id, k)`. (`stop_counts` stays
  * Scala-only: its stopword-list parameter has no SQL literal form.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info,
        GraftExtensions.checkedBuilder(name, builder)))
    }
    // plan rewrite: naive time-interval joins → binned equi-joins
    // (see plans.BinIntervalJoins). Conf-gated on this route (off by
    // default; `SET spark.graft.binIntervalJoins.enabled=true`) — the
    // extension loads for every session, and an unconditional rewrite
    // would silently re-plan already-keyed interval joins. The runtime
    // route (`BinIntervalJoins.withRule` /
    // `spark.experimental.extraOptimizations`) stays ungated: attaching
    // the rule yourself is the opt-in.
    ext.injectOptimizerRule(_ => graft.plans.BinIntervalJoinsGated)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (name, info, builder) triples shared by both registration routes. */
  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("rolling_hash",
        info("rolling_hash", "rolling_hash(str) - polynomial rolling hash"),
        { case Seq(e) =>
          RollingHashExpr(e, RollingHashExpr.DefaultBase, RollingHashExpr.DefaultMod)
        }),
      ("simhash",
        info("simhash", "simhash(array<long>) - 30-bit SimHash of token hashes"),
        { case Seq(e) => SimHashExpr(e) }),
      ("shingle_hashes",
        info("shingle_hashes",
          "shingle_hashes(text, n) - distinct word n-gram rolling hashes"),
        { case Seq(t, n) => ShingleHashesExpr(t, intLit(n, "shingle size n")) }),
      ("minhash_sig",
        info("minhash_sig", "minhash_sig(array<long>) - 8-component MinHash"),
        { case Seq(e) => MinHashSigExpr(e) }),
      ("dot_long",
        info("dot_long", "dot_long(array<long>, array<long>) - integer dot product"),
        { case Seq(a, b) => DotProductLongExpr(a, b) }),
      ("token_hashes",
        info("token_hashes",
          "token_hashes(text) - rolling hash of every whitespace token"),
        { case Seq(e) => TokenHashesExpr(e) }),
      ("sorted_intersect_size",
        info("sorted_intersect_size",
          "sorted_intersect_size(array<long>, array<long>) - distinct common " +
            "values of two sorted arrays"),
        { case Seq(a, b) => SortedIntersectSizeExpr(a, b) }),
      ("top_k_by_sim",
        info("top_k_by_sim",
          "top_k_by_sim(sim, id, k) - top-k (neighbor_id, sim) pairs per group"),
        { case Seq(s, id, k) => TopKBySim(s, id, intLit(k, "k")) }),
      ("top_ngram_count",
        info("top_ngram_count",
          "top_ngram_count(text, n) - multiplicity of the most frequent " +
            "word n-gram (by rolling hash)"),
        { case Seq(t, n) => TopNgramCountExpr(t, intLit(n, "ngram size n")) }))

  /** Wrap a builder so a wrong argument count surfaces as a clear
    * error instead of a raw scala.MatchError from the partial
    * function. */
  private val arities = Map("rolling_hash" -> 1, "simhash" -> 1,
    "shingle_hashes" -> 2, "minhash_sig" -> 1, "dot_long" -> 2,
    "token_hashes" -> 1, "sorted_intersect_size" -> 2,
    "top_k_by_sim" -> 3, "top_ngram_count" -> 2)

  /** Wrap a builder so a wrong argument count surfaces as a clear
    * error instead of a raw scala.MatchError from the partial
    * function. */
  private[graft] def checkedBuilder(name: String,
      builder: Seq[Expression] => Expression): Seq[Expression] => Expression = {
    exprs =>
      val arity = arities(name)
      if (exprs.length != arity)
        throw new IllegalArgumentException(
          s"$name expects $arity argument(s), got ${exprs.length}")
      builder(exprs)
  }

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, checkedBuilder(name, builder))
    }
}
