package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline

class SkylineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Definitional all-pairs dominance — the oracle's formulation. */
  private def bruteSkyline(pts: Seq[(Double, Long)]): Set[(Double, Long)] =
    pts.filter { case (c, b) =>
      !pts.exists { case (c2, b2) =>
        c2 <= c && b2 >= b && (c2 < c || b2 > b)
      }
    }.toSet

  test("skyline2d: staircase frontier, same-cost/same-benefit " +
       "dominance edges, extra columns pass through") {
    val pts = Seq(
      (0.0, 3L, "a"), (1.0, 7L, "b"), (1.0, 5L, "c"), // c: same cost as b
      (2.0, 9L, "d"), (2.0, 8L, "e"),                 // e: dominated by d
      (3.0, 9L, "f"),                                 // f: same benefit as d
      (5.0, 10L, "g"), (4.0, 1L, "h")                 // h: dominated by a
    ).toDF("cost", "benefit", "tag")
    val got = Skyline.skyline2d(pts, "cost", "benefit", pruneBuckets = 2)
      .orderBy("cost").as[(Double, Long, String)].collect().toSeq
    assert(got == Seq((0.0, 3L, "a"), (1.0, 7L, "b"), (2.0, 9L, "d"),
      (5.0, 10L, "g")))
  }

  test("skyline2d matches the brute-force dominance definition on a " +
       "seeded point cloud across bucket counts") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(300)((rnd.nextInt(40).toDouble, rnd.nextInt(40).toLong))
      .distinct
    val want = bruteSkyline(pts)
    for (buckets <- Seq(1, 7, 32)) {
      val got = Skyline.skyline2d(pts.toDF("cost", "benefit"),
          "cost", "benefit", pruneBuckets = buckets)
        .as[(Double, Long)].collect().toSet
      assert(got == want, s"buckets=$buckets")
    }
  }
}
