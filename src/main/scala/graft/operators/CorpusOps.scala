package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw ingest and batch construction: benchmark decontamination,
  * repetition filtering, deterministic stratified sampling, and corpus
  * document-frequency statistics.
  *
  * These go beyond the reference's surface (BFS_map_reduce.py has no
  * text pipeline at all) — they are the "would a 100 TB pretraining
  * pipeline need this" set, built on the same primitives as the dedup
  * family ([[Dedup.shingleHashes]], [[TextAnalysis.rollingHash]]) so
  * every formula has an exact DuckDB twin in SparkEntry.oracleSql.
  *
  * Scale notes (100 TB, 1000 executors):
  *  - decontaminate: the eval-set gram table is tiny relative to the
  *    corpus (benchmarks are MBs, corpora are TBs) — it is broadcast,
  *    so the corpus-side gram stream never shuffles; the only exchange
  *    is the final per-doc count aggregation (map-side combined).
  *  - repetitionStats: explode + two-level hash aggregation; both
  *    shuffles are on (doc_id[, bigram]) with partial aggregation, so
  *    reducers see combiner output, not raw grams.
  *  - stratifiedSample: a pure per-row filter on a portable hash — no
  *    shuffle, no sampling state, reproducible across runs/engines.
  *  - docFrequency: explode distinct tokens + one hash aggregation;
  *    vocabulary (distinct tokens) is orders of magnitude smaller than
  *    the corpus, so the post-agg side is small.
  */
object CorpusOps extends CachePinning {

  /** Token n-gram size used for decontamination overlap. 4 balances
    * false positives (shared short phrases) against misses; standard
    * pipelines use 8-13 on natural text — the synthetic corpus's small
    * vocabulary needs the shorter gram to exercise both outcomes. */
  val DecontamGramSize = 4

  /** Default eval-set membership modulus for [[decontaminate]]:
    * `id % EvalMod == 0` marks a doc as held-out. Named so the DuckDB
    * oracle SQL is generated from the same constant. */
  val EvalMod = 20

  /** Flag training documents that share any token `n`-gram with a
    * held-out evaluation set (benchmark decontamination).
    *
    * The eval set is defined deterministically as `id % evalMod == 0`
    * (in a real pipeline it would be the benchmark corpus read from
    * its own table; the membership predicate is orthogonal to the
    * overlap machinery). Grams are compared by their rolling hash
    * ([[Dedup.shingleHashes]], one native pass, then `array_distinct`
    * on the HASHES — shingleHashes dedups on the shingle STRING, so a
    * within-doc hash collision would otherwise double-count a gram);
    * the oracle computes the identical hash set, so engine and oracle
    * agree bit-for-bit even on the (astronomically rare) collision.
    *
    * Returns one row per CONTAMINATED training doc:
    * `(id, n_shared_grams)` where n_shared_grams counts the distinct
    * n-gram hashes of the doc that appear anywhere in the eval set.
    */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
                    n: Int = DecontamGramSize, evalMod: Int = EvalMod): DataFrame = {
    // one shingling pass shared by the eval and train consumers —
    // ShingleHashesExpr is the dominant per-row cost, so the projection
    // is pinned rather than recomputed per join side (release via
    // CorpusOps.releaseCaches() after materializing the result)
    val grams = pin(df.select(col(idCol),
      explode(array_distinct(Dedup.shingleHashes(col(textCol), n)))
        .as("gram")))
    val isEval = pmod(col(idCol), lit(evalMod)) === 0
    val evalGrams = grams.filter(isEval).select("gram").distinct()
    // eval grams ≪ corpus grams: broadcast, so the corpus side streams
    // through a map-side hash probe with no exchange before the agg
    grams.filter(!isEval)
      .join(broadcast(evalGrams), "gram")
      .groupBy(idCol)
      // per-doc grams are distinct by construction (array_distinct
      // above), so count(*) == distinct shared-gram count
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Fraction threshold above which a doc's most frequent bigram marks
    * it repetitive (Gopher-style repetition filter, public rule family:
    * Rae et al. 2021 §A1.1 use top-2-gram fraction > 0.18). */
  val TopBigramFracThreshold = 0.12

  /** Per-document repetition statistics: bigram multiplicities and
    * duplicate-token mass, the Gopher/C4-style quality-filter inputs.
    *
    * Returns `(id, n_tokens, n_distinct_tokens, dup_token_frac,
    * n_bigrams, top_bigram_n, top_bigram_frac, repetitive)`. Both
    * fractions are integer-derived double divisions (bit-exact across
    * engines); `repetitive` = top_bigram_frac > [[TopBigramFracThreshold]].
    *
    * Docs with fewer than 2 tokens have no bigrams and are omitted
    * (the synthetic corpus floor is 10 tokens; a production caller
    * would left-join this onto the base table).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // bigrams WITH multiplicity — Dedup.shingles dedups, so build the
    // slide directly; guard size>=2 (sequence(1,0) would step backward)
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val base = df.select(col(idCol), size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      bigrams.as("bigrams"))
    val perBigram = base.select(col(idCol), explode(col("bigrams")).as("bg"))
      .groupBy(idCol, "bg").agg(count(lit(1)).as("n"))
    val perDoc = perBigram.groupBy(idCol)
      .agg(sum("n").as("n_bigrams"), max("n").as("top_bigram_n"))
    base.drop("bigrams").join(perDoc, idCol)
      .withColumn("dup_token_frac",
        (col("n_tokens") - col("n_distinct_tokens")).cast("double") /
          col("n_tokens"))
      .withColumn("top_bigram_frac",
        col("top_bigram_n").cast("double") / col("n_bigrams"))
      .withColumn("repetitive",
        col("top_bigram_frac") > TopBigramFracThreshold)
      .select(col(idCol), col("n_tokens"), col("n_distinct_tokens"),
        col("dup_token_frac"), col("n_bigrams"), col("top_bigram_n"),
        col("top_bigram_frac"), col("repetitive"))
  }

  /** Deterministic hash-based stratified sampling: keep a row iff
    * `rolling_hash(id) % 100 < pct(stratum)`. Reproducible across
    * runs, engines, and cluster sizes (no RNG, no sampling state —
    * the sample is a pure function of the row), and stable under
    * corpus growth: adding documents never changes the in/out status
    * of existing ones, unlike reservoir or fraction-of-partition
    * sampling. Per-row filter — no shuffle.
    *
    * `pctByStratum` maps stratum values to keep-percentages (0-100);
    * unlisted strata use `defaultPct`. Adds a `sampled` boolean rather
    * than filtering, so callers can audit rates per stratum.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       pctByStratum: Map[String, Int],
                       defaultPct: Int): DataFrame = {
    require(defaultPct >= 0 && defaultPct <= 100 &&
      pctByStratum.values.forall(p => p >= 0 && p <= 100),
      s"sample percentages must be in [0,100]")
    val pct = pctByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPct)) { case (els, (s, p)) =>
        when(col(strataCol) === s, lit(p)).otherwise(els)
      }
    val bucket = pmod(
      TextAnalysis.rollingHash(col(idCol).cast("string")), lit(100))
    df.withColumn("sampled", bucket < pct)
  }

  /** Corpus document-frequency statistics: for each token, the number
    * of documents containing it (`doc_freq`) and its corpus fraction
    * `df_frac = doc_freq / n_docs` (the IDF input — left as an exact
    * ratio; `ln` is libm-dependent and would break bit-exact oracles).
    *
    * One explode of DISTINCT tokens per doc + one hash aggregation;
    * the total-docs scalar joins in as a broadcast single row (no
    * driver-side collect).
    */
  def docFrequency(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
    val total = df.agg(count(lit(1)).as("n_docs"))
    toks.groupBy("token").agg(count(lit(1)).as("doc_freq"))
      .crossJoin(broadcast(total))
      .withColumn("df_frac", col("doc_freq").cast("double") / col("n_docs"))
  }
}
