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
}
