package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Error bounds for the sketch-path aggregates (q_sketch_stats): the
  * exact faces are oracle-checked; the sketches are checked against
  * the exact values here since their bit patterns are
  * implementation-defined. */
class SketchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct within rsd bound; approx_percentile near exact") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val rows = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_extendedprice").as("approx"),
        count_distinct($"l_extendedprice").as("exact"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("ap50"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        min($"l_quantity").as("lo"), max($"l_quantity").as("hi"))
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, approx, exact, ap50, p50, lo, hi) =>
      // default HLL rsd is 5%; allow 4 sigma
      assert(math.abs(approx - exact).toDouble / exact < 0.20, s"$flag HLL")
      assert(ap50 >= lo && ap50 <= hi, s"$flag percentile range")
      // GK sketch with accuracy 1000 on ~20k rows per group: the rank
      // error is ≤ n/1000, so the value lands within a few quantity
      // steps of the true median
      assert(math.abs(ap50 - p50) <= 3.0, s"$flag ap50=$ap50 p50=$p50")
    }
  }
}
