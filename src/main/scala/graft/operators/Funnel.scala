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
}
