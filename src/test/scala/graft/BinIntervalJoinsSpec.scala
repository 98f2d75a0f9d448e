package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BinIntervalJoins
import graft.streaming.EventStream

class BinIntervalJoinsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def withRule[A](f: => A): A = BinIntervalJoins.withRule(spark)(f)

  private def sides(): (DataFrame, DataFrame) = {
    val ev = EventStream.eventsTable(spark, dir)
    (ev.filter(col("event_type") === "purchase")
       .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
         col("event_id")),
     ev.filter(col("event_type") === "view")
       .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
         col("value")))
  }

  private def planStr(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("keyed interval join: rewritten result == naive result, " +
      "and the bin reaches the join keys") {
    val (p, v) = sides()
    val cond = expr("p_user = v_user AND v_ts < p_ts " +
      "AND v_ts > p_ts - INTERVAL '1' HOUR")
    val naive = p.join(v, cond).select("event_id", "v_ts", "value")
    val (rewritten, plan) = withRule {
      val r = p.join(v, cond).select("event_id", "v_ts", "value")
      (r.collect().toSeq, planStr(r))
    }
    assert(plan.contains("__graft_bin"),
      s"rule did not fire — no bin column in plan:\n$plan")
    assert(rewritten.toSet == naive.collect().toSet)
    assert(rewritten.size == naive.count())
  }

  test("keyless pure time join: BroadcastNestedLoopJoin becomes an " +
      "equi-join on the bin, identical pairs") {
    val (p, v) = sides()
    // no key: every (purchase, view) pair within the hour, cross-user
    val cond = expr("v_ts <= p_ts AND p_ts - v_ts < INTERVAL '20' MINUTE")
    val naive = p.join(v, cond)
    val naivePlan = planStr(naive)
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      s"precondition: the naive keyless plan should be a BNLJ:\n$naivePlan")
    val (gotCount, gotSet, plan) = withRule {
      val r = p.join(v, cond).select("event_id", "v_ts", "value")
      (r.count(), r.collect().toSet, planStr(r))
    }
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"rule did not remove the nested-loop join:\n$plan")
    assert(plan.contains("__graft_bin"))
    val expected = naive.select("event_id", "v_ts", "value")
    assert(gotCount == expected.count())
    assert(gotSet == expected.collect().toSet)
  }

  test("BETWEEN sugar desugars into the recognized bound pair") {
    val (p, v) = sides()
    val cond = expr(
      "p_user = v_user AND v_ts BETWEEN p_ts - INTERVAL '1' HOUR AND p_ts")
    val naive = p.join(v, cond).select("event_id", "v_ts", "value")
    val (got, plan) = withRule {
      val r = p.join(v, cond).select("event_id", "v_ts", "value")
      (r.collect().toSet, planStr(r))
    }
    assert(plan.contains("__graft_bin"),
      s"BETWEEN form did not trigger the rewrite:\n$plan")
    assert(got == naive.collect().toSet)
  }

  test("half-bounded and non-inner conditions are left untouched") {
    val (p, v) = sides()
    withRule {
      // upper bound only — unbounded fan-out, must bail
      val half = p.join(v, expr("v_ts < p_ts"))
      assert(!planStr(half).contains("__graft_bin"))
      // left_outer — out of scope, must bail
      val outer = p.join(v, expr("p_user = v_user AND v_ts < p_ts " +
        "AND v_ts > p_ts - INTERVAL '1' HOUR"), "left_outer")
      assert(!planStr(outer).contains("__graft_bin"))
    }
  }

  test("half-bounded bail is observable: diagnosis names the missing " +
      "bound; complete and non-interval joins stay silent") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val (p, v) = sides()
    // optimizedPlan, not analyzed: the rule runs after constant
    // folding, where `p_ts - INTERVAL '1' HOUR` is a folded literal
    // offset — the analyzed tree still carries UnaryMinus(Literal)
    // and would mis-read a complete condition as half-bounded
    def joinNode(df: DataFrame): Join =
      df.queryExecution.optimizedPlan.collectFirst { case j: Join => j }
        .getOrElse(fail("no Join in the optimized plan"))
    // `v_ts < p_ts` alone bounds p_ts - v_ts from BELOW only — how far
    // back a view may be is unbounded, so the missing bound is upper
    val half = BinIntervalJoins.halfBoundedInfo(
      joinNode(p.join(v, expr("v_ts < p_ts"))))
    assert(half.size == 1, s"expected one diagnosis line, got $half")
    assert(half.head.contains("no finite upper bound") &&
      half.head.contains("p_ts") && half.head.contains("v_ts"),
      s"diagnosis does not name the missing bound/columns: ${half.head}")
    // complete interval condition: nothing to warn about
    assert(BinIntervalJoins.halfBoundedInfo(joinNode(p.join(v,
      expr("v_ts < p_ts AND v_ts > p_ts - INTERVAL '1' HOUR")))).isEmpty)
    // ordinary equi-join: not an interval join manque, stays silent
    assert(BinIntervalJoins.halfBoundedInfo(joinNode(p.join(v,
      expr("p_user = v_user")))).isEmpty)
  }

  test("inclusive/exclusive bound arithmetic is exact at the boundary") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("lk", "lts")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:00")),   // delta 0
      (2L, ts("2024-01-01 09:40:00")),   // delta 20min (== bound)
      (3L, ts("2024-01-01 09:40:00.000001")), // just inside
      (4L, ts("2024-01-01 10:00:00.000001"))  // future — outside
    ).toDF("rk", "rts")
    val cond = expr("rts <= lts AND lts - rts < INTERVAL '20' MINUTE")
    val naive = l.join(r, cond).select("rk").as[Long].collect().toSet
    val got = withRule {
      l.join(r, cond).select("rk").as[Long].collect().toSet
    }
    assert(naive == Set(1L, 3L))
    assert(got == naive)
  }
}
