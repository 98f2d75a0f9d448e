package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  test("funnelCounts: strict-order subsequence per user, greedy earliest") {
    val events = Seq(
      // user 1: view(1) click(2) purchase(3) — completes all 3
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // user 2: click(1) view(2) — click precedes the view: step 1 only
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      // user 3: purchase(1) view(2) click(3) — purchase too early: step 2
      (3L, ts(1), "purchase"), (3L, ts(2), "view"), (3L, ts(3), "click"),
      // user 4: view and click at the SAME instant — strict >, step 1
      (4L, ts(5), "view"), (4L, ts(5), "click"),
      // user 5: view(1) click(2) click(4) purchase(3) — the greedy
      // earliest click(2) admits purchase(3): completes all 3
      (5L, ts(1), "view"), (5L, ts(2), "click"), (5L, ts(4), "click"),
      (5L, ts(3), "purchase"),
      // user 6: no view at all — contributes to no step
      (6L, ts(1), "click"), (6L, ts(2), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq
    assert(out == Seq(
      (1, "view", 5L),      // users 1-5
      (2, "click", 3L),     // users 1, 3, 5
      (3, "purchase", 2L))) // users 1, 5
  }

  test("funnelCounts: zero matches downstream still emit zero rows") {
    val events = Seq((1L, ts(1), "view")).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("view", "click")).as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "view", 1L), (2, "click", 0L)))
  }

  test("transitionMatrix: adjacent pairs per user, id tiebreak at " +
       "equal ts, truncating per-mille over the from-row total") {
    val events = Seq(
      // u1: view -> click -> purchase -> view
      (1L, 1L, ts(1), "view"), (2L, 1L, ts(2), "click"),
      (3L, 1L, ts(3), "purchase"), (4L, 1L, ts(4), "view"),
      // u2: two views at the SAME instant — event_id orders them
      (6L, 2L, ts(1), "view"), (5L, 2L, ts(1), "view"),
      (7L, 2L, ts(2), "click"),
      // u3: single event — no transition
      (8L, 3L, ts(1), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.transitionMatrix(events, "user_id", "ts",
        "event_type", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("click", "purchase", 1L, 1L, 1000L),
      ("purchase", "view", 1L, 1L, 1000L),
      ("view", "click", 2L, 3L, 666L),
      ("view", "view", 1L, 3L, 333L)))
  }
}
