package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-distribution statistics between corpus splits — the
  * mixture-drift monitor and the perplexity quality filter of a
  * training-data pipeline. Both faces are EXACT by the
  * quantize-the-algorithm discipline: the only transcendental
  * involved (log2) runs in fixed point via
  * [[Ranking.withLog2Fixed]] (integer square-and-renormalize,
  * spec-pinned ≤1 ulp), so DuckDB replays every step bit-for-bit.
  *
  * The reference engine has no text statistics at all; these faces
  * are beyond-parity pipeline capability (the CCNet-style corpus
  * curation stack: detect mixture drift between snapshots, score
  * documents against a reference LM, drop the tail).
  */
object Distributions extends CachePinning {

  /** KL-divergence drift between two token distributions with
    * Laplace (+1) smoothing over the UNION vocabulary, plus per-token
    * drift attribution: the k tokens contributing most to
    * KL(A‖B).
    *
    * Math, all integers: with per-token counts cA, cB, totals
    * CA, CB and union vocab size V, the smoothed ratio is
    * pA/pB = (cA+1)(CB+V) / ((cB+1)(CA+V)) = num/den, and the
    * signed fixed-point log is
    * `slog2 = sign · floor(2^F·log2(max/min))` — symmetric by
    * construction (swapping A and B flips only the sign), so
    * KL(B‖A) reuses the same column negated. Token contribution
    * to KL(A‖B)·(CA+V)·2^F is exactly `(cA+1)·slog2` (a BIGINT,
    * emitted raw — no division, no sign-rounding hazard); the
    * global divergences are the two sign-safe truncating
    * divisions `kl_ab_milli = 1000·Σ w / ((CA+V)·2^F)`.
    *
    * Overflow headroom: num, den < (c+1)·(C+V); exact while that
    * product stays under 2^63 (≈9·10^18) — beyond that, pre-scale
    * both totals by a common power of two (one documented extra
    * quantization), same plan.
    *
    * Shape at 100 TB: ONE corpus scan (the pinned |V|-row count
    * frame feeds all three consumers — totals, attribution, global
    * KL), the split tag riding the tokenize explode; per-(token)
    * conditional sums = ONE exchange on token (map-side combined);
    * totals + vocab size ride a broadcast single-row aggregate; the
    * F-round log2 chain runs columnar on the |V|-row frame
    * (distributed — the vocab is never collected); global Σw is one
    * more map-side-combined aggregate; top-k attribution is
    * TakeOrderedAndProject. */
  def klDriftTopK(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 20, fracBits: Int = 8): DataFrame = {
    require(k > 0, s"k > 0: $k")
    val tok = docs.select(
        (col(idCol).cast("long") % 2 === 0).as("in_a"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    // pinned: the |V|-row count frame feeds the totals aggregate, the
    // top-k attribution AND the global-KL aggregate — without the pin
    // each consumer re-runs the corpus tokenize scan (4 scans of the
    // 100 TB input instead of 1). Callers release via releaseCaches.
    val counts = pin(tok.groupBy("token").agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
      sum(when(col("in_a"), 0L).otherwise(1L)).as("c_b")))
    val totals = counts.agg(
      sum(col("c_a")).as("ca"), sum(col("c_b")).as("cb"),
      count(lit(1)).as("v"))
    val ratio = counts.crossJoin(broadcast(totals))
      .withColumn("num", expr("(c_a + 1) * (cb + v)"))
      .withColumn("den", expr("(c_b + 1) * (ca + v)"))
      .withColumn("big", greatest(col("num"), col("den")))
      .withColumn("small", least(col("num"), col("den")))
    val sl = Ranking.withLog2Fixed(ratio, "big", "small", "mag", fracBits)
      .withColumn("slog2_q8",
        expr("CASE WHEN num >= den THEN mag ELSE -mag END"))
      .withColumn("w_ab", expr("(c_a + 1) * slog2_q8"))
      .withColumn("w_ba", expr("(c_b + 1) * -slog2_q8"))
    // global KL both directions: sign-safe truncating milli-bits
    // (Σw is ≥ 0 up to quantization — Gibbs — but the division must
    // be replayable either way, so truncate the magnitude)
    val scale = 1L << fracBits
    val glob = sl.agg(
        sum(col("w_ab")).as("s_ab"), sum(col("w_ba")).as("s_ba"),
        first(col("ca")).as("ca"), first(col("cb")).as("cb"),
        first(col("v")).as("v"))
      .select(
        expr(s"CASE WHEN s_ab >= 0 THEN (1000 * s_ab) div ((ca + v) * $scale) " +
          s"ELSE -((1000 * -s_ab) div ((ca + v) * $scale)) END")
          .as("kl_ab_milli"),
        expr(s"CASE WHEN s_ba >= 0 THEN (1000 * s_ba) div ((cb + v) * $scale) " +
          s"ELSE -((1000 * -s_ba) div ((cb + v) * $scale)) END")
          .as("kl_ba_milli"))
    val top = sl
      .select(col("token"), col("c_a"), col("c_b"),
        col("slog2_q8"), col("w_ab").as("contrib_q8"))
      .orderBy(col("contrib_q8").desc, col("token")).limit(k)
    top.crossJoin(broadcast(glob))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("contrib_q8").desc, col("token"))))
      .select("rank", "token", "c_a", "c_b", "slog2_q8", "contrib_q8",
        "kl_ab_milli", "kl_ba_milli")
  }

  /** Unigram-LM perplexity scoring — the classic corpus quality
    * filter (CCNet/KenLM shape, unigram instead of 5-gram): train a
    * Laplace-smoothed unigram model on the REFERENCE split (even
    * ids), score every CANDIDATE document (odd ids) by its
    * per-token bit cost; downstream curation drops the
    * highest-perplexity tail.
    *
    * Exactness: −log2 p(t) = log2((CA+V)/(cA(t)+1)) is a log of a
    * ratio of positive integers with numerator ≥ denominator —
    * [[Ranking.withLog2Fixed]] applies directly, no sign handling
    * at all. Per doc: `nll_q8 = Σ_tokens tf·log2fix` (exact
    * BIGINT), `bits_milli = 1000·nll_q8 div (2^F·n_tok)` (one
    * truncating division of nonnegative integers).
    *
    * Shape at 100 TB: ONE corpus tokenize scan, summarized into the
    * pinned per-(doc, token) tf frame; the model is one further
    * exchange of THAT frame on token; V rides the broadcast
    * single-row totals; the log2 chain runs columnar on the |V|-row
    * model frame; scoring joins candidate tf ⋈ model merge-hinted on
    * token (the model is vocabulary-sized — NEVER broadcast); the
    * per-doc sum is one exchange on doc. */
  def unigramPerplexity(docs: DataFrame, idCol: String,
                        textCol: String,
                        fracBits: Int = 8): DataFrame = {
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("in_a", col("doc_id") % 2 === 0)
    // pinned: ONE corpus tokenize scan feeds everything downstream —
    // the per-(doc, token) frame derives the union vocab (and through
    // it the model and its totals) AND the candidate tf side; without
    // the pin each consumer re-runs the corpus scan. |D·T|-sized:
    // far smaller than the exploded token stream it summarizes.
    val dtf = pin(tok.groupBy("doc_id", "in_a", "token")
      .agg(count(lit(1)).as("tf")))
    // union vocab with reference counts (cand-only tokens get c_a=0,
    // i.e. the +1 smoothing mass — every scoring token has a prob)
    val vocab = dtf.groupBy("token").agg(
      sum(when(col("in_a"), col("tf")).otherwise(0L)).as("c_a"))
    val totals = vocab.agg(sum(col("c_a")).as("ca"),
      count(lit(1)).as("v"))
    val model = Ranking.withLog2Fixed(
      vocab.crossJoin(broadcast(totals))
        .withColumn("p", expr("ca + v"))
        .withColumn("q", expr("c_a + 1")),
      "p", "q", "nll_tok_q8", fracBits)
      .select("token", "nll_tok_q8")
    val candTf = dtf.filter(!col("in_a"))
      .select("doc_id", "token", "tf")
    // merge-join hint: the model is VOCABULARY-sized (billions of
    // distinct tokens on a 100 TB corpus) — never broadcastable; the
    // small-SF planner would happily broadcast either side here, so
    // declare the scale shape explicitly
    candTf.join(model.hint("merge"), "token")
      .groupBy("doc_id")
      .agg(sum(expr("tf * nll_tok_q8")).as("nll_q8"),
        sum(col("tf")).as("n_tok"))
      .withColumn("bits_milli",
        expr(s"(1000 * nll_q8) div (${1L << fracBits} * n_tok)"))
      .select("doc_id", "n_tok", "nll_q8", "bits_milli")
  }
}
