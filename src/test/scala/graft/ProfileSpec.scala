package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

class ProfileSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("profile: nulls, exact distincts, numeric min/max in one pass") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 1.5, "a"), (2L, null, "b"), (2L, 2.5, null))
      .toDF("id", "v", "s")
    val out = Profile.profile(df, Seq("id", "v"), Seq("s"))
      .orderBy("column")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(out == Seq(
      ("id", 3L, 0L, 2L, Some(1.0), Some(2.0)),
      ("s", 3L, 1L, 2L, None, None),
      ("v", 3L, 1L, 2L, Some(1.5), Some(2.5))))
  }

  test("profile plans ONE scan of the input") {
    val df = Seq((1L, "x")).toDF("id", "s")
    val plan = Profile.profile(df, Seq("id"), Seq("s"))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1, s"profile scans the input ${scans.size} times")
  }

  test("dqAudit counts violations per rule; empty frames read as 0/0") {
    import org.apache.spark.sql.functions._
    val fact = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("id", "fk")
    val dim = Seq(10L, 20L).toDF("k")
    val joined = fact.join(dim, $"fk" === $"k", "left")
    val empty = Seq.empty[(Long, Long)].toDF("id", "fk")
    val got = Profile.dqAudit(Seq(
        ("fk_orphans", joined, $"k".isNull),
        ("neg_ids", fact, $"id" < 0),
        ("empty_table", empty, $"id" < 0)))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("empty_table", 0L, 0L),
      ("fk_orphans", 3L, 1L),
      ("neg_ids", 3L, 0L)))
  }
}
