package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Robust per-group anomaly detection: median / MAD (median absolute
  * deviation) outlier flagging — the estimator monitoring pipelines
  * use where mean/stddev would be dragged by the very anomalies they
  * are hunting (one 10^6× bad value moves a z-score threshold by
  * orders of magnitude; it moves the median by one rank). Beyond-
  * parity capability: the reference computes no statistics at all.
  *
  * Exactness: values are integer-quantized by the caller (the
  * established cents idiom, `floor(value·100)` — positive values, so
  * Spark's truncating cast == DuckDB's floor); the median is the
  * LOWER median, i.e. the ⌈n/2⌉-th order statistic — an integer
  * picked from the data, never an interpolated float — and MAD is
  * the lower median of |v − med|. The robust z emitted per row is
  * `dev·1000 div mad` (milli-MADs, truncating BIGINT division, NULL
  * when mad = 0), so the whole output is engine-exact integers.
  *
  * Shape at 100 TB — the value-frequency selection trick: a naive
  * per-group median sorts every ROW inside each group partition
  * (groups are few here — event types — so one partition would hold
  * corpus/|groups| rows: the non-scaling window). Instead the
  * selection runs over the VALUE-FREQUENCY table: one map-side-
  * combined exchange to (group, value, count) — bounded by distinct
  * values per group (quantized cents: ≤ ~10^5 per group regardless
  * of row count) — then a running-count window over those distinct
  * values finds the smallest value whose cumulative count reaches
  * ⌈n/2⌉. Two selection passes (median, then MAD over deviations),
  * each touching only the frequency table; the per-group (med, mad)
  * frame is |groups| rows and joins back to rows by group key (Spark
  * broadcasts it when small; the join degrades to shuffle when
  * |groups| is corpus-scale — both shapes correct).
  *
  * mad = 0 (more than half the group on one value) flags every
  * dev > 0 row when k·0 < dev — the defined behavior; rz_milli is
  * NULL there rather than a division blow-up.
  */
object RobustStats {

  /** Per-group lower median of `valCol` over the frequency table.
    * Input columns: (g, v); output: (g, med_of_v). */
  private def groupMedian(df: DataFrame, out: String): DataFrame = {
    val freq = df.groupBy("g", "v").agg(count(lit(1)).as("c"))
    val byV = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("g")
    freq
      .withColumn("cum", sum(col("c")).over(byV))
      .withColumn("n", sum(col("c")).over(all))
      .groupBy("g")
      .agg(min(when(expr("cum >= (n + 1) div 2"), col("v")))
        .as(out))
  }

  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
                  valCol: String, k: Long = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rows = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      col(valCol).cast("long").as("v"))
    val med = groupMedian(rows, "med")
    val withDev = rows.join(med, "g")
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = groupMedian(
      withDev.select(col("g"), col("dev").as("v")), "mad")
    withDev.join(mad, "g")
      .filter(col("dev") > lit(k) * col("mad"))
      .select(col("g"), col("id"), col("v"), col("med"), col("mad"),
        col("dev"),
        when(col("mad") > 0, expr("dev * 1000 div mad")).as("rz_milli"))
  }
}
