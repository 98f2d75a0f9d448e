package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Retention
import java.sql.Timestamp

class RetentionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cohortRetention builds the retention triangle") {
    // 2026-01-05 and 2026-01-12 are Mondays (week starts).
    // u1: first event wk0, active wk0 + wk1 + wk2
    // u2: first event wk0, active wk0 only (two events, same week)
    // u3: first event wk1, active wk1 + wk2
    val events = Seq(
      (1L, ts("2026-01-05 10:00:00")), (1L, ts("2026-01-13 10:00:00")),
      (1L, ts("2026-01-19 09:00:00")),
      (2L, ts("2026-01-06 10:00:00")), (2L, ts("2026-01-07 11:00:00")),
      (3L, ts("2026-01-14 10:00:00")), (3L, ts("2026-01-21 10:00:00"))
    ).toDF("user_id", "ts")

    val out = Retention.cohortRetention(events)
      .select(col("cohort_week").cast("string"), col("week_offset"),
        col("n_users"))
      .as[(String, Int, Long)].collect().toSet

    assert(out == Set(
      ("2026-01-05", 0, 2L), // u1 + u2
      ("2026-01-05", 1, 1L), // u1
      ("2026-01-05", 2, 1L), // u1
      ("2026-01-12", 0, 1L), // u3
      ("2026-01-12", 1, 1L))) // u3
  }

  test("offset 0 recovers exact cohort sizes (every user active in " +
      "their first week)") {
    // 50 users, each with first event in week (uid % 3), some with
    // later noise events
    val rows = (0L until 50L).flatMap { u =>
      val first = ts(s"2026-01-${5 + 7 * (u % 3).toInt} 08:00:00")
      val noise = if (u % 5 == 0)
        Seq((u, ts("2026-02-02 08:00:00"))) else Nil
      Seq((u, first)) ++ noise
    }
    val out = Retention.cohortRetention(rows.toDF("user_id", "ts"))
      .filter(col("week_offset") === 0)
      .select(col("cohort_week").cast("string"), col("n_users"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("2026-01-05" -> 17L, "2026-01-12" -> 17L,
      "2026-01-19" -> 16L))
  }
}
