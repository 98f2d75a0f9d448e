package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular per-key event
  * stream onto a fixed bucket grid and fill observation gaps by
  * last-observation-carried-forward (LOCF) — the standard
  * feature-engineering step in front of anything that expects
  * equally-spaced series (forecasting, anomaly detection, windowed
  * model features). (Beyond-reference capability: the reference's
  * event handling stops at per-line parsing — `Graph.py:4-8`;
  * regularization is what event streams need before modeling.)
  *
  * Semantics: bucket index = epoch_µs div stepUs; within a (key,
  * bucket) the LAST observation wins, "last" under the strict total
  * order (ts_µs, id) with `id` a unique tiebreaker column, so
  * same-microsecond events resolve identically in any engine (the
  * O12 argmin-by-struct discipline). The grid spans each key's
  * [min bucket, max bucket] — leading/trailing emptiness is NOT
  * invented (resampling regularizes the observed span, it does not
  * extrapolate), which also makes LOCF total: every key's first grid
  * bucket contains its first observation. Carried values pass through
  * untouched (no arithmetic), so doubles stay bit-identical.
  *
  * Scale shape: ONE partial-aggregated exchange reduces the corpus to
  * (key, bucket) rows — the only full-size work; spans are a second
  * exchange over the already-reduced frame; the grid explodes
  * map-side from |keys| span rows and is require-guarded against a
  * runaway span (one rogue key at a 30-year span with 1 s steps would
  * otherwise explode 10^9 rows out of a single grid row — fail loudly
  * instead); the LOCF window sorts each key's buckets once, the same
  * exchange+sort any per-key sequence op pays. No driver loops, no
  * collects.
  */
object TimeSeries {

  /** @param events input frame
    * @param keyCol series key column (e.g. user id)
    * @param tsCol event-time TIMESTAMP column
    * @param idCol unique row id column (castable to long) — the
    *              within-bucket tiebreaker
    * @param valCol carried value column
    * @param stepUs bucket width in microseconds
    * @param maxBucketsPerKey explosion guard on any single key's span
    * @return (k, bucket_ts, n_obs, is_gap, v_filled) — one row per
    *         grid bucket; `v_filled` the LOCF-carried value */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
                   idCol: String, valCol: String, stepUs: Long,
                   maxBucketsPerKey: Long = 10000000L): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive: $stepUs")
    val obs = events.select(
        col(keyCol).as("k"),
        expr(s"unix_micros($tsCol) div $stepUs").as("bi"),
        unix_micros(col(tsCol)).as("us"),
        col(idCol).cast("long").as("i"),
        col(valCol).as("v"))
      .groupBy(col("k"), col("bi"))
      .agg(count(lit(1)).as("n_obs"),
        max(struct(col("us"), col("i"), col("v"))).as("m"))
    // persisted (not checkpointed): consumed by the guard action AND
    // the lazy grid below — a checkpoint released before the caller
    // materializes the result would strand the grid's lineage, while
    // a persisted frame degrades to recompute if evicted. The
    // harness's per-query sweep reclaims it (the Verify/Bench
    // operator-persist contract).
    val spans = obs.groupBy(col("k"))
      .agg(min(col("bi")).as("b0"), max(col("bi")).as("b1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // |keys|-bounded aggregate action: the explosion guard must run
    // BEFORE the explode below materializes anything
    val worst = spans.agg(max(col("b1") - col("b0"))).head()
    val worstSpan = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    require(worstSpan < maxBucketsPerKey,
      s"a key spans $worstSpan buckets (cap $maxBucketsPerKey) — " +
        "raise stepUs or split the series before resampling")
    val grid = spans.select(col("k"),
      explode(sequence(col("b0"), col("b1"))).as("bi"))
    val w = Window.partitionBy("k").orderBy("bi")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("k", "bi"), "left")
      .select(
        col("k"), timestamp_micros(col("bi") * stepUs).as("bucket_ts"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("m").isNull.cast("long").as("is_gap"),
        last(col("m.v"), ignoreNulls = true).over(w).as("v_filled"))
  }

  /** Per-key linear trend — grouped OLS over (bucket index, value) in
    * EXACT integer arithmetic: is each user's spend rising or falling,
    * and how fast? The closed-form normal equations need only five
    * sums, so the whole regression is ONE partial-aggregated exchange
    * with |keys| output rows — the grouped-model-fit pattern (per-key
    * OLS today; the same sums-only shape carries per-key variance,
    * covariance, Pearson r) without any per-key iteration or collect.
    *
    * Determinism (the quantize-the-algorithm doctrine): x = bucket
    * index shifted to the key's own origin (min bucket), y = value in
    * cents (floor of value·100 — the established double→cents
    * contract); slope is the integer
    * `(n·Σxy − Σx·Σy) · 1000 div (n·Σx² − (Σx)²)` (milli-cents per
    * bucket), intercept `(Σy·1000 − slope·Σx) div n` (milli-cents at
    * the key's origin, defined ON the truncated slope) — every
    * intermediate a BIGINT both engines evaluate identically. A key
    * whose events all land in one bucket has zero x-variance: slope
    * and intercept are NULL (guarded — ANSI div would throw).
    *
    * Overflow headroom: with per-key span ≤ S buckets, n rows, cents
    * ≤ C, the largest term n·Σxy is ≤ n²·S·C — at S=10³, C=10⁵ that
    * holds to n ≈ 3·10⁵ rows per key; beyond, widen the sums to
    * decimal(38,0) (same plan shape, ~2× agg cost — the measured
    * decimal penalty from the PageRank accumulator). */
  def groupedTrend(events: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive: $stepUs")
    val agg = events.select(
        col(keyCol).as("k"),
        expr(s"unix_micros($tsCol) div $stepUs").as("bi"),
        floor(col(valCol) * 100).cast("long").as("y"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), min(col("bi")).as("b0"),
        sum(col("bi")).as("sbi"), sum(col("y")).as("sy"),
        sum(col("bi") * col("y")).as("sbiy"),
        sum(col("bi") * col("bi")).as("sbii"))
    // shift to the per-key origin: Σx = Σbi − n·b0 etc — exact, and
    // keeps every product far from 2^63 (bi alone is ~5·10^5 for
    // epoch-hours; shifted x is the key's span)
    agg.select(col("k"), col("n"),
        (col("sbi") - col("n") * col("b0")).as("sx"),
        col("sy"),
        (col("sbiy") - col("b0") * col("sy")).as("sxy"),
        (col("sbii") - lit(2) * col("b0") * col("sbi") +
          col("n") * col("b0") * col("b0")).as("sxx"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope_milli",
        when(col("den") === 0L, lit(null).cast("long"))
          .otherwise(expr("((n * sxy - sx * sy) * 1000) div den")))
      .withColumn("intercept_milli",
        when(col("den") === 0L, lit(null).cast("long"))
          .otherwise(expr("(sy * 1000 - slope_milli * sx) div n")))
      .select(col("k"), col("n"), col("slope_milli"), col("intercept_milli"))
  }
}
