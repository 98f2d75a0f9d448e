package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: pair left rows with right rows whose
  * timestamp falls in a sliding interval relative to the left row's,
  * per equality key — `r.ts - l.ts ∈ [lowerUs, upperUs)`. The classic
  * "events within the preceding hour" / interval-overlap operator
  * (absent from the reference, which has no joins at all; a
  * beyond-parity capability).
  *
  * Why not `left.join(right, key && r.ts between ...)` directly: a
  * pure range predicate gives Catalyst no equi-join key for the time
  * axis, so the range part is evaluated AFTER the key-equi join — fine
  * when keys are selective, quadratic per hot key when they aren't
  * (one user with 1M events → 10¹² candidate pairs at 100 TB). The
  * binned form quantizes time into buckets of exactly the interval
  * length and adds the bucket to the join key: each right row is
  * replicated into the (at most) 2 buckets whose left rows it could
  * match, the join becomes a plain equi-join on (key, bucket) —
  * shuffle-hash/sort-merge, AQE-skew-splittable — and the exact range
  * predicate only filters within-bucket candidates. Candidate blowup
  * is bounded by rows-per-bucket, not rows-per-key.
  *
  * This is the standard large-scale interval-join shape (Flink's
  * interval join and Databricks' range-join hint binning do the same).
  */
object RangeJoin {

  /** Pairs `(left, right)` where `right.tsCol - left.tsCol` lies in
    * `[lowerUs, upperUs)` (microseconds) and key columns match.
    *
    * @param left     probe side; all its columns are kept
    * @param right    build side; its replicated arm is the one that is
    *                 doubled, so pass the smaller/denser-keyed side here
    * @param keyCols  equality key column names (present on both sides)
    * @param lTs,rTs  event-time columns (TimestampType), left/right
    * @param rValueCols right columns to carry, emitted as `r_<name>`
    * @return one row per matching pair: left columns + `r_ts` + values */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                lTs: String, rTs: String, lowerUs: Long, upperUs: Long,
                rValueCols: Seq[String], joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"unsupported join type $joinType (left is never replicated, so " +
        "only inner/left_outer are well-defined)")
    require(upperUs > lowerUs, s"empty interval [$lowerUs, $upperUs)")
    // loud failure instead of silent clobbering / ambiguous output:
    // "__bin"/"__r_ts" are internal, "r_ts"/"r_<c>" are the outputs
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin")
        && !right.columns.contains("__r_ts"),
      "input uses reserved internal column names (__bin/__r_ts)")
    require(!rValueCols.contains(rTs),
      s"$rTs is always carried as r_ts — drop it from rValueCols")
    val outNames = "r_ts" +: rValueCols.map(c => s"r_$c")
    require(outNames.distinct.size == outNames.size &&
        !outNames.exists(left.columns.contains),
      s"output columns $outNames collide with each other or the left side")
    val binUs = upperUs - lowerUs
    // exact floor-division bin: `/` on long Columns is DOUBLE division,
    // inexact past 2^53 (far-future sentinel timestamps) — subtracting
    // the pmod makes the dividend an exact multiple, and decimal
    // division keeps the quotient exact at any timestamp magnitude
    def binOf(us: Column): Column =
      ((us - pmod(us, lit(binUs))).cast("decimal(38,0)") / binUs).cast("long")
    // shift right timestamps so the match condition becomes
    // shifted - l ∈ [0, binUs): then floor-bins of width binUs differ
    // by at most 1 and each right row lands in exactly 2 candidate bins
    val lBin = binOf(unix_micros(col(lTs)))
    val rBin = binOf(unix_micros(col(rTs)) - lowerUs)
    val rCols = keyCols.map(col) ++
      Seq(col(rTs).as("__r_ts"),
        explode(array(rBin, rBin - 1)).as("__bin")) ++
      rValueCols.map(c => col(c).as(s"r_$c"))
    val r = right.select(rCols: _*)
    val l = left.withColumn("__bin", lBin)
    val delta = unix_micros(col("__r_ts")) - unix_micros(col(lTs))
    // the range predicate rides INSIDE the join condition: for inner
    // joins a post-filter is equivalent, but for left_outer it must
    // decide matchedness (a post-filter would drop unmatched rows)
    val cond = keyCols.map(k => l(k) === r(k))
      .reduce(_ && _) && l("__bin") === r("__bin") &&
      delta >= lowerUs && delta < upperUs
    val joined = l.join(r, cond, joinType)
    val keep = l.columns.filterNot(_ == "__bin").map(l(_)) ++
      Seq(r("__r_ts").as("r_ts")) ++
      rValueCols.map(c => r(s"r_$c").as(s"r_$c"))
    // no dedup needed under left_outer: a right row's two bin copies
    // differ in __bin while each left row holds exactly one bin value,
    // so a (left, right) pair can match through at most one copy —
    // and the unreplicated left side appears exactly once when unmatched
    joined.select(keep: _*)
  }

  /** Convenience: for each left row, COUNT and decimal-exact SUM of a
    * right value over the strictly-preceding window `(l.ts - windowUs,
    * l.ts)` — left rows with no matches kept with (0, 0).
    *
    * Value-magnitude contract: values are summed as decimal(18,6)
    * (money-like magnitudes, mirroring the DuckDB oracle); a single
    * value beyond 10^12 overflows the cast (null under non-ANSI —
    * silently excluded from the sum — or an error under ANSI). Widen
    * the cast on both engine and oracle sides together if a domain
    * needs more.
    *
    * Contract: left rows must be distinct as full tuples (carry a
    * unique id column if the source can replay). Fully-identical left
    * rows fall into one group and their counts merge — a synthetic
    * per-row id can't fix that deterministically (generated ids change
    * under task retry, corrupting exactly-once aggregation). */
  def precedingWindowStats(left: DataFrame, right: DataFrame,
                           keyCols: Seq[String], lTs: String, rTs: String,
                           windowUs: Long, valueCol: String): DataFrame = {
    // left_outer binned join keeps unmatched left rows inline — one
    // aggregation over the pair stream, no join-back to the left table
    // (a separate inner-join + re-join costs two extra exchanges)
    val pairs = rangeJoin(left, right, keyCols, lTs, rTs,
      lowerUs = -windowUs + 1, upperUs = 0, rValueCols = Seq(valueCol),
      joinType = "left_outer")
    pairs
      .groupBy((left.columns.map(col)): _*)
      .agg(count(col("r_ts")).as("n_matched"),
        coalesce(sum(col(s"r_$valueCol").cast("decimal(18,6)")),
          lit(0).cast("decimal(18,6)")).cast("double").as("matched_value"))
  }
}
