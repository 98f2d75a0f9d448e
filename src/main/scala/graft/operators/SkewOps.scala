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
    // salt by source partition: spreads a hot key across however many
    // partitions it arrives from, independent of the VALUE distribution
    // (a value-derived hash collapses when the hot key's values are
    // constant/low-cardinality — exactly the skew case). Any salt is
    // correctness-neutral: the two-phase agg is associative.
    val salt = pmod(spark_partition_id(), lit(saltBuckets))
    df.select(col(keyCol).as("key"),
        col(valueCol).cast("decimal(30,6)").as("v"), salt.as("salt"))
      .groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).cast("double").as("total"))
  }
}
