package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{RollingHashExpr, StopCountsExpr}

/** Text-analysis operators for a large-scale training-data pipeline:
  * token/char statistics, BPE-ish token counting, quality scoring,
  * stopword-based language identification, and document fingerprints.
  *
  * Everything is a narrow, codegen'd per-row projection built from
  * `org.apache.spark.sql.functions` (+ one native Catalyst expression,
  * [[graft.functions.RollingHashExpr]]) — no UDFs, no shuffles; at
  * 100 TB these run at parquet scan speed with column pruning (only
  * the text column is read).
  *
  * Determinism note: every formula here is mirrored verbatim in the
  * DuckDB oracle SQL (SparkEntry.oracleSql) — same operand order, same
  * integer->double division points — so results hash-match bit-for-bit.
  */
object TextAnalysis {

  /** Small embedded stopword marker lists (public knowledge). Order of
    * the map drives the deterministic tie-break priority. */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "es" -> Seq("el", "la", "que", "en", "un", "es", "se", "no", "por", "los"),
    "fr" -> Seq("le", "la", "et", "un", "est", "que", "pour", "dans", "une", "les"))

  private val CjkPattern = "[\\x{4e00}-\\x{9fff}]"
  /** Word / number / single-symbol tokens — a BPE-ish pre-tokenizer. */
  private val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** NULL text is treated as the empty string throughout this module:
    * real corpora carry null fields, and letting them propagate turns
    * `size(split(null))` into -1/null surprises deep inside a funnel.
    * An all-ops-null-safe contract beats per-caller coalescing. */
  private def nn(text: Column): Column = coalesce(text, lit(""))

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(nn(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of BPE-ish tokens (words, numbers, individual symbols). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(nn(text), lit(BpeTokenPattern))

  def punctCount(text: Column): Column =
    regexp_count(nn(text), lit("[^A-Za-z0-9\\s]"))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** Tokens of `text` that appear in `words` (with multiplicity).
    * One native pass ([[StopCountsExpr]]) — the definitionally-equal
    * `size(filter(tokens, array_contains(...)))` runs an interpreted
    * lambda per token. */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    element_at(StopCountsExpr.stop_counts(nn(text), Seq(words)), 1)

  /** All [[StopwordLists]] counts in one pass; identical instances of
    * this expression collapse to a single evaluation per row via
    * subexpression elimination, so languageId + qualityScore in one
    * projection tokenize/test once. */
  private def allStopCounts(text: Column): Column =
    StopCountsExpr.stop_counts(nn(text), StopwordLists.map(_._2))

  /** Stopword-hit + CJK-presence language guess; 'und' when no
    * marker matches. Deterministic: ties resolve in StopwordLists
    * order. A heuristic n-gram-free language ID suited to a codegen'd
    * scan — not a statistical model. */
  def languageId(text: Column): Column = {
    val all = allStopCounts(text)
    val counts = StopwordLists.zipWithIndex.map { case ((l, _), i) =>
      l -> element_at(all, i + 1)
    }
    val zh = regexp_count(nn(text), lit(CjkPattern)) > 0
    // lang wins if its count is positive and >= all later langs' counts
    // (earlier langs already had their chance), scanned in list order.
    val base: Column = lit("und")
    val guess = counts.reverse.foldLeft(base) { case (els, (l, c)) =>
      val beats = counts.collect {
        case (l2, c2) if l2 != l => c >= c2
      }.reduce(_ && _)
      when(c > 0 && beats, lit(l)).otherwise(els)
    }
    when(zh, lit("zh")).otherwise(guess)
  }

  /** Heuristic quality score in [0,1]: length, lexical diversity, low
    * punctuation noise, natural-language stopword presence. */
  def qualityScore(text: Column): Column = {
    val tok = tokenCount(text).cast("double")
    val uniq = distinctTokenCount(text).cast("double")
    val punct = punctCount(text).cast("double")
    // element 1 = StopwordLists.head ("en"); same fused expression as
    // languageId's, so one projection computes the counts once
    val stop = element_at(allStopCounts(text), 1).cast("double")
    lit(0.25) * least(lit(1.0), tok / 50.0) +
      lit(0.25) * (uniq / (tok + 1.0)) +
      lit(0.25) * (lit(1.0) - least(lit(1.0), punct * 5.0 / (tok + 1.0))) +
      lit(0.25) * least(lit(1.0), stop * 5.0 / (tok + 1.0))
  }

  /** Canonical-form fingerprint: md5 of lowercased, punct-stripped,
    * whitespace-collapsed text. Equal fingerprints = same content
    * modulo case/punct/spacing (exact-dedup key). */
  def fingerprintMd5(text: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(nn(text)), "[^a-z0-9\\s]", ""), "\\s+", " ")))

  /** Polynomial rolling hash (native codegen'd expression). */
  def rollingHash(text: Column): Column =
    RollingHashExpr.rolling_hash(nn(text))

  /** All per-document statistics in one projection. */
  def withStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpe_tokens", bpeTokenCount(t))
      .withColumn("n_punct", punctCount(t))
      .withColumn("n_distinct_tokens", distinctTokenCount(t))
      .withColumn("guessed_lang", languageId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprintMd5(t))
      .withColumn("rhash", rollingHash(t))
  }
}
