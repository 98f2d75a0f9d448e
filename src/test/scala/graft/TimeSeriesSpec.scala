package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val StepUs = 1000000L // 1 s buckets for hand cases

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def frame(rows: (Long, Long, Long, Double)*) =
    rows.toDF("k", "us", "i", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"),
        col("i"), col("v"))

  test("gaps are filled LOCF; observed buckets keep their own value") {
    // key 1: obs at 0s and 3s — buckets 1,2 are gaps carrying 10.0
    val out = TimeSeries.resampleLocf(
        frame((1L, 0L, 1L, 10.0), (1L, 3000000L, 2L, 30.0)),
        "k", "ts", "i", "v", StepUs)
      .orderBy("bucket_ts").collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 0L, 0L, 1L)) // n_obs
    assert(out.map(_.getLong(3)).toSeq == Seq(0L, 1L, 1L, 0L)) // is_gap
    assert(out.map(_.getDouble(4)).toSeq == Seq(10.0, 10.0, 10.0, 30.0))
  }

  test("within-bucket last wins under the (ts, id) total order") {
    // same bucket: later ts wins; same ts: larger id wins
    val out = TimeSeries.resampleLocf(
        frame((1L, 100L, 1L, 1.0), (1L, 200L, 2L, 2.0),
          (1L, 200L, 3L, 3.0)),
        "k", "ts", "i", "v", StepUs).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 3L)     // n_obs
    assert(out.head.getDouble(4) == 3.0)  // (200, id 3) wins
  }

  test("grid spans only [min, max] per key — no extrapolation") {
    val out = TimeSeries.resampleLocf(
        frame((1L, 5000000L, 1L, 1.0), (2L, 0L, 2L, 2.0),
          (2L, 1000000L, 3L, 2.5)),
        "k", "ts", "i", "v", StepUs)
    assert(out.filter(col("k") === 1L).count() == 1)
    assert(out.filter(col("k") === 2L).count() == 2)
    // every key's first bucket is observed, so v_filled is total
    assert(out.filter(col("v_filled").isNull).count() == 0)
  }

  test("groupedTrend: exact OLS on a hand case; zero-x-variance key " +
      "yields NULL slope") {
    // key 1: y_cents = (100, 300, 500) at buckets 0,1,2 → slope
    // exactly 200 cents/bucket = 200000 milli, intercept 100 cents =
    // 100000 milli. key 2: all in one bucket → NULL slope/intercept.
    val out = TimeSeries.groupedTrend(
        frame((1L, 0L, 1L, 1.0), (1L, 1000000L, 2L, 3.0),
          (1L, 2000000L, 3L, 5.0),
          (2L, 0L, 4L, 7.0), (2L, 100L, 5L, 9.0)),
        "k", "ts", "v", StepUs)
      .orderBy("k").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 3L)
    assert(out(0).getLong(2) == 200000L)
    assert(out(0).getLong(3) == 100000L)
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
  }

  test("groupedTrend: slope truncation follows integer div (toward " +
      "negative infinity in both engines' div)") {
    // y = (0, 100) over buckets 0..1 with a third point breaking the
    // exact fit: y_cents = 0, 100, 50 → n=3, sx=3, sy=150, sxy=200,
    // sxx=5; den=6; slope = (3*200-3*150)*1000 div 6 = 25000
    val out = TimeSeries.groupedTrend(
        frame((1L, 0L, 1L, 0.0), (1L, 1000000L, 2L, 1.0),
          (1L, 2000000L, 3L, 0.5)),
        "k", "ts", "v", StepUs).collect()
    assert(out.head.getLong(2) == 25000L)
  }

  test("explosion guard trips on a runaway span") {
    val e = intercept[IllegalArgumentException] {
      TimeSeries.resampleLocf(
        frame((1L, 0L, 1L, 1.0), (1L, 3000000L, 2L, 2.0)),
        "k", "ts", "i", "v", StepUs, maxBucketsPerKey = 3L)
    }
    assert(e.getMessage.contains("buckets"))
  }
}
