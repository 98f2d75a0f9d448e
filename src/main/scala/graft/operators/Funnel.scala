package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion analysis: how many users complete step 1,
  * then step 2 strictly after it, then step 3 strictly after that —
  * the classic product-analytics query (view → click → purchase).
  *
  * Semantics: a user reaches step i iff their events contain the step
  * types as a SUBSEQUENCE in strictly increasing timestamp order. The
  * implementation takes each user's EARLIEST valid match per step
  * (greedy earliest-match, which is optimal for subsequence tests: if
  * any valid chain exists, the greedy one exists).
  *
  * Shape at 100 TB: stage i is `events(type = sᵢ) ⋈ reached(i-1)` on
  * the user key followed by a per-user min — every stage keys on the
  * same high-cardinality user id, so after each side's first hash
  * exchange the joins/aggregations stay co-partitioned, and each
  * stage's event subset shrinks (only step-i events move). No
  * per-user event-list materialization, no windows over user
  * partitions, no driver state.
  *
  * Returns one row per step: `(step, event_type, n_users)`, step
  * 1-indexed. Counting each stage re-derives the chain up to it
  * (stages are cheap relative to persisting k corpus-keyed frames;
  * callers running VERY deep funnels can persist the last stage).
  */
object Funnel {

  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"duplicate step types not supported: $steps")
    val stages = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (s, _)) =>
        val ev = events.filter(col(typeCol) === s)
          .select(col(userCol).as("u"), col(tsCol).as("ts"))
        Some(prev match {
          case None =>
            ev.groupBy(col("u")).agg(min(col("ts")).as("t"))
          case Some(r) =>
            ev.join(r.select(col("u"), col("t").as("t_prev")), "u")
              .filter(col("ts") > col("t_prev"))
              .groupBy(col("u")).agg(min(col("ts")).as("t"))
        })
    }.flatten
    stages.zip(steps).zipWithIndex
      .map { case ((stage, s), i) =>
        stage.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(s).as("event_type"),
            col("n_users"))
      }
      .reduce(_.unionByName(_))
      .orderBy("step")
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for each ordered pair of event types, how often an
    * event of `from_type` is IMMEDIATELY followed — within the same
    * user's timeline, ordered by timestamp with `orderCol` as the
    * deterministic tiebreak — by one of `to_type`, plus the per-from
    * row total and a truncating per-mille transition probability.
    * The user-journey model behind "what happens after a click"
    * analyses and Markov-chain attribution; the sequential
    * complement of [[funnelCounts]] (which tests a FIXED subsequence,
    * where this measures ALL adjacent transitions).
    *
    * Exact by construction: counts and one truncating `div` — no
    * floating probability, so the DuckDB oracle replays it
    * bit-for-bit.
    *
    * Shape at 100 TB: consecutive pairs come from ONE lead() window
    * partitioned by user — per-user state, bounded by the busiest
    * user, never corpus-sized. The pair rollup exchanges on
    * (from, to), cardinality |types|²: partial aggregation collapses
    * every map task to at most |types|² rows before the shuffle, so
    * the exchange moves KBs per task regardless of input size. The
    * row totals ride a window over the |types|²-row aggregate — no
    * second scan of the events. */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, orderCol: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("ts"), col("ord"))
    val byFrom = org.apache.spark.sql.expressions.Window
      .partitionBy("from_type")
    events
      .select(col(userCol).as("u"), col(tsCol).as("ts"),
        col(orderCol).as("ord"), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(byUser))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("from_total", sum(col("n")).over(byFrom))
      .withColumn("permille", expr("n * 1000 div from_total"))
  }
}
