package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: salted two-phase aggregation.
  *
  * A `groupBy(key).agg(...)` over a power-law key (the norm in web
  * corpora: one domain = 10% of documents) sends every hot-key row to
  * one reducer. Salting splits each key into `saltBuckets` sub-keys,
  * aggregates partially per (key, salt) — spreading the hot key over
  * the cluster — then combines the partials per key. Works for any
  * algebraic aggregate (sum/count/min/max here).
  *
  * AQE's skew-join handling covers JOINS automatically; aggregation
  * skew still needs this pattern (partial aggregation helps only when
  * upstream partitions already spread the hot key — after a skewed
  * join output, they don't).
  */
object SkewOps {

  /** Salted count + sum per key. Deterministic results, identical to
    * the direct `groupBy(key).agg(count, sum)` — only the exchange
    * topology differs. `sum` runs on the supplied column cast to
    * decimal for order-free exactness. */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
                     saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    // deterministic salt (hash of the full row's monotonic id would be
    // random-ish but non-deterministic across retries; spread by a
    // cheap value-derived hash instead)
    val salt = pmod(xxhash64(col(valueCol)), lit(saltBuckets))
    df.select(col(keyCol).as("key"),
        col(valueCol).cast("decimal(30,6)").as("v"), salt.as("salt"))
      .groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).cast("double").as("total"))
  }
}
