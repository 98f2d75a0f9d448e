package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: salted two-phase aggregation.
  *
  * WHEN this pattern earns its keep (and when it doesn't): for purely
  * ALGEBRAIC aggregates (sum/count/min/max), Catalyst's map-side
  * partial aggregation already caps a hot key at one partial row per
  * upstream partition, so salting adds a second exchange for nothing.
  * Salting matters when the per-key reduce state is HOLISTIC — exact
  * distinct counts, collect_list/set, large TypedImperativeAggregate
  * buffers — or when the input partitions themselves are skewed (the
  * output of a skewed join): phase 1 groups by (key, salt) so the hot
  * key's heavy state is built on `saltBuckets` reducers, phase 2
  * combines the small per-salt results. AQE's skew handling covers
  * JOIN inputs; it does not split a single aggregation key.
  *
  * [[saltedDistinctAndSum]] demonstrates the pattern with an exact
  * count_distinct (holistic: its phase-1 state is a per-key hash set).
  */
object SkewOps {

  /** Salted exact-distinct + sum per key: phase 1 dedups/sums within
    * (key, salt) buckets, phase 2 merges. `n_distinct` is exact
    * because a value lands in exactly one salt bucket per key when
    * salted by a hash OF THE VALUE — which simultaneously spreads a
    * hot key's distinct-set state across `saltBuckets` reducers.
    * `sum` runs on decimal for order-free exactness (values assumed
    * within decimal(30,6) range — money-like magnitudes). */
  def saltedDistinctAndSum(df: DataFrame, keyCol: String, valueCol: String,
                           saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    // value-derived salt: REQUIRED for distinct correctness (equal
    // values must meet in the same bucket to dedup) — and it spreads
    // the hot key's state whenever the key has many distinct values,
    // which is exactly when its distinct-set state is heavy.
    // Hash the POST-CAST value: distinct runs over the decimal, so two
    // raw values that round to the same decimal must land in one bucket
    // (salting the raw value would double-count them).
    val v = col(valueCol).cast("decimal(30,6)")
    val salt = pmod(xxhash64(v), lit(saltBuckets))
    df.select(col(keyCol).as("key"), v.as("v"), salt.as("salt"))
      .groupBy(col("key"), col("salt"))
      .agg(count_distinct(col("v")).as("pd"), sum(col("v")).as("ps"),
        count(lit(1)).as("pc"))
      .groupBy(col("key"))
      .agg(sum(col("pd")).as("n_distinct"), sum(col("pc")).as("n"),
        sum(col("ps")).cast("double").as("total"))
  }

  /** Salted equi-join for extreme single-key skew: the left (fact)
    * side gets a deterministic salt in [0, saltBuckets) hashed from
    * its whole row, the right side is replicated once per salt value,
    * and the join key becomes (key..., salt) — a hot key's rows spread
    * over `saltBuckets` reducers instead of one straggler task.
    * Output rows (including duplicates) are identical to the direct
    * join; only the physical distribution changes.
    *
    * When to reach for it: AQE's skew-join handling already splits
    * skewed SORT-MERGE/shuffle-hash partitions at runtime, and a
    * broadcast join sidesteps skew entirely — use this when the right
    * side is too big to broadcast AND the plan must be fixed up front
    * (AQE off, or a downstream stage must inherit the salted
    * distribution, e.g. a holistic per-key aggregate fed by the join).
    * Replication costs |right| × saltBuckets — keep the dimension side
    * right and the bucket count modest.
    *
    * (The reference has no joins at all — SURVEY.md §2.2; this is a
    * beyond-parity scale primitive.)
    *
    * @param joinType `inner` or `left_outer` — the left side is never
    *        replicated (one salt per row), so left-outer null-extension
    *        is exact; right/full outer would see each unmatched right
    *        row `saltBuckets` times and are rejected. */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                 saltBuckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    require(joinType == "inner" || joinType == "left_outer",
      s"unsupported join type $joinType (right side is replicated, so " +
        "only inner/left_outer are well-defined)")
    // collision-free salt column: a user column named "__salt" would
    // otherwise be silently replaced on the left / duplicated on the
    // right by withColumn
    val taken = (left.columns ++ right.columns).toSet
    val saltCol = Iterator.from(0).map(i => s"__salt$i")
      .find(n => !taken.contains(n)).get
    // hash of the hashable left columns: deterministic (no rand()), and
    // rows of a hot key spread as long as the rows themselves differ.
    // MapType isn't hashable (xxhash64 rejects it at analysis) — skip
    // such columns; a row of ONLY maps degrades to a single bucket
    // (plain join) rather than failing.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val hashCols = left.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name))
    val saltExpr =
      if (hashCols.isEmpty) lit(0L)
      else pmod(xxhash64(hashCols.toIndexedSeq: _*), lit(saltBuckets))
    val l = left.withColumn(saltCol, saltExpr)
    val r = right.withColumn(saltCol,
      explode(typedLit((0L until saltBuckets.toLong).toArray)))
    l.join(r, keyCols :+ saltCol, joinType).drop(saltCol)
  }
}
