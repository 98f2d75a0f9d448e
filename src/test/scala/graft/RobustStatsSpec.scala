package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RobustStats

class RobustStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], k: Long = 3) =
    RobustStats.madOutliers(
        rows.toDF("g", "id", "v"), "g", "id", "v", k)
      .orderBy("g", "id")
      .as[(String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq

  test("lower median + MAD, hand-computed on an odd group") {
    // [10,12,14,16,100]: med = 14 (3rd of 5), devs sorted [0,2,2,4,86]
    // -> mad = 2; k=3 flags dev > 6: only the 100 (dev 86, rz 43000)
    val out = run(Seq(("a", 1L, 10L), ("a", 2L, 12L), ("a", 3L, 14L),
      ("a", 4L, 16L), ("a", 5L, 100L)))
    assert(out == Seq(("a", 5L, 100L, 14L, 2L, 86L, Some(43000L))))
  }

  test("even group takes the LOWER median (the ceil(n/2)-th order stat)") {
    // [1,3,5,7]: ceil(4/2)=2nd -> med 3; devs [2,0,2,4] sorted [0,2,2,4]
    // -> mad = 2; k=1 flags dev > 2: only v=7 (dev 4)
    val out = run(Seq(("e", 1L, 1L), ("e", 2L, 3L), ("e", 3L, 5L),
      ("e", 4L, 7L)), k = 1)
    assert(out == Seq(("e", 4L, 7L, 3L, 2L, 4L, Some(2000L))))
  }

  test("mad = 0 (majority on one value): every deviating row flags, " +
      "rz_milli is NULL instead of dividing by zero") {
    // [1,1,1,5,100]: med 1, devs [0,0,0,4,99] -> mad 0
    val out = run(Seq(("z", 1L, 1L), ("z", 2L, 1L), ("z", 3L, 1L),
      ("z", 4L, 5L), ("z", 5L, 100L)))
    assert(out == Seq(
      ("z", 4L, 5L, 1L, 0L, 4L, None),
      ("z", 5L, 100L, 1L, 0L, 99L, None)))
  }

  test("groups are independent: a wild group does not move a tame one " +
      "(the robustness contract a global z-score breaks)") {
    val tame = (1L to 9L).map(i => ("t", i, 10L + i)) // 11..19, med 15
    val wild = Seq(("w", 1L, 0L), ("w", 2L, 1000000L), ("w", 3L, 5L))
    val out = run(tame ++ wild, k = 3)
    // tame devs sorted [0,1,1,2,2,3,3,4,4] -> mad 2, no dev > 6
    assert(!out.exists(_._1 == "t"))
    // wild: med 5, devs [5, 999995, 0] -> mad 5, flags the million
    assert(out.map(r => (r._1, r._2)) == Seq(("w", 2L)))
  }
}
