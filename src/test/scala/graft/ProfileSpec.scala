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

  test("histogramQuantiles: estimate within one bucket width of the " +
      "exact discrete quantile on random data; exact when width is 1") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map(_ => ("a", rnd.nextLong(1000000L))) ++
      (1 to 300).map(_ => ("b", rnd.nextLong(200L))) ++ // narrow: width 1
      Seq(("c", 7L)) // single-row group
    val df = rows.toDF("g", "v")
    val got = graft.operators.Profile
      .histogramQuantiles(df, "v", "g", buckets = 512, ps = Seq(50, 95))
      .collect().map(r => r.getString(0) -> r).toMap
    for ((g, vs) <- rows.groupBy(_._1)) {
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      def disc(p: Int): Long = sorted((n * p + 99) / 100 - 1)
      val r = got(g)
      val width = r.getLong(4)
      assert(math.abs(r.getLong(5) - disc(50)) < width, s"$g p50")
      assert(math.abs(r.getLong(6) - disc(95)) < width, s"$g p95")
      if (width == 1L) { // bucket == value: the sketch is exact
        assert(r.getLong(5) == disc(50) && r.getLong(6) == disc(95), g)
      }
    }
    // single-row group: lo == hi == both quantiles
    assert(got("c").getLong(5) == 7L && got("c").getLong(6) == 7L)
  }
}
