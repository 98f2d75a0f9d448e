package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention analysis over an event stream — the classic
  * product-analytics triangle: users are grouped into cohorts by the
  * week of their FIRST event; each cell (cohort_week, week_offset)
  * counts how many of that cohort's users were active `week_offset`
  * weeks later.
  *
  * Beyond-reference capability (events-table family, next to
  * [[Funnel]]): the reference has no notion of users or time.
  *
  * Scale shape (100 TB of events): ONE exchange on `user_id` serves
  * both the cohort assignment (min-over-user window) and the
  * per-user activity distinct — the window's partitioning is reused
  * by the downstream distinct's partial aggregate. The final
  * (cohort, offset) aggregate is a partial-agg rollup to a tiny
  * frame (weeks × offsets). No driver-side state; `count_distinct`
  * runs as the standard two-phase distinct aggregate, keyed on the
  * already-clustered user. Weeks are computed with `date_trunc`
  * (codegen'd) — no UDFs.
  */
object Retention {

  /** @param events frame with `user_id` and a timestamp column `tsCol`
    * @return DataFrame(cohort_week DATE, week_offset INT, n_users LONG)
    *         — one row per non-empty cell, n_users = distinct users of
    *         cohort `cohort_week` active in week cohort+offset.
    *         Offset 0 is the cohort size (every user is active in
    *         their own first week by construction). */
  def cohortRetention(events: DataFrame, tsCol: String = "ts"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    val wk = date_trunc("week", col(tsCol)).cast("date")
    val byUser = Window.partitionBy($"user_id")
    events
      .select($"user_id", wk.as("wk"))
      .withColumn("cohort_week", min($"wk").over(byUser))
      .select($"cohort_week",
        (datediff($"wk", $"cohort_week") / 7).cast("int").as("week_offset"),
        $"user_id")
      .groupBy($"cohort_week", $"week_offset")
      .agg(count_distinct($"user_id").as("n_users"))
  }
}
