package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000)
  private val MinUs = 60L * 1000000

  test("rangeJoin pairs rows within [lower, upper) across bin boundaries") {
    val left = Seq((1L, ts(60), "p1"), (1L, ts(125), "p2"), (2L, ts(60), "p3"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(0), 1.0),   // exactly 60 min before p1: outside (strict)
      (1L, ts(1), 2.0),   // 59 min before p1: inside
      (1L, ts(59), 3.0),  // 1 min before p1: inside (different bin than ts(1))
      (1L, ts(60), 4.0),  // simultaneous with p1: outside; 65 before p2: no
      (1L, ts(124), 5.0), // 1 min before p2: inside
      (2L, ts(59), 6.0))  // other key: matches p3 only
      .toDF("user_id", "ts", "value")
    // window: right.ts - left.ts ∈ [-60min+1us, 0) i.e. strictly-prior hour
    val got = RangeJoin.rangeJoin(left, right, Seq("user_id"), "ts", "ts",
        lowerUs = -60 * MinUs + 1, upperUs = 0, rValueCols = Seq("value"))
      .select($"tag", $"r_value").as[(String, Double)].collect().toSet
    assert(got == Set(("p1", 2.0), ("p1", 3.0), ("p2", 5.0), ("p3", 6.0)))
  }

  test("matches the naive non-equi join on real events at sf0.001") {
    val events = graft.streaming.EventStream.eventsTable(spark, "/root/testdata/sf0.001")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    val views = events.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"ts".as("v_ts"), $"value")
    val win = 3600L * 1000000
    val binned = RangeJoin.rangeJoin(purchases, views.withColumnRenamed("v_user", "user_id")
          .withColumnRenamed("v_ts", "ts2"), Seq("user_id"), "ts", "ts2",
        lowerUs = -win + 1, upperUs = 0, rValueCols = Seq("value"))
      .select($"event_id", $"r_ts", $"r_value")
      .as[(Long, Timestamp, Double)].collect().toSet
    val naive = purchases.join(views,
        $"user_id" === $"v_user" && $"v_ts" < $"ts" &&
          unix_micros($"ts") - unix_micros($"v_ts") < win)
      .select($"event_id", $"v_ts", $"value")
      .as[(Long, Timestamp, Double)].collect().toSet
    assert(binned == naive)
    assert(naive.nonEmpty) // fixture actually exercises the operator
  }

  test("property: binned join == naive join on random intervals/keys/timestamps") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      nL <- Gen.choose(1, 30); nR <- Gen.choose(1, 30)
      keys <- Gen.choose(1, 3)
      // timestamps within a few bin-widths so boundary cases are dense
      lRows <- Gen.listOfN(nL, Gen.zip(Gen.choose(0L, keys - 1L),
        Gen.choose(0L, 500L)))
      rRows <- Gen.listOfN(nR, Gen.zip(Gen.choose(0L, keys - 1L),
        Gen.choose(0L, 500L)))
      lower <- Gen.choose(-120L, 60L)
      width <- Gen.choose(1L, 150L)
    } yield (lRows, rRows, lower, lower + width)
    val epoch = 1700000000000000L // µs; avoid epoch-0 edge cases
    (1 to 12).flatMap(i => caseGen.apply(Gen.Parameters.default,
        Seed(i.toLong))).foreach { case (lRows, rRows, lowerUs, upperUs) =>
      // build timestamps at exact µs precision (java.sql.Timestamp
      // through toDF only carries ms)
      val l = lRows.zipWithIndex.map { case ((k, t), i) => (k, epoch + t, i.toLong) }
        .toDF("k", "us", "lid").withColumn("ts", timestamp_micros($"us")).drop("us")
      val r = rRows.zipWithIndex.map { case ((k, t), i) => (k, epoch + t, i.toLong) }
        .toDF("k", "us", "rid").withColumn("ts", timestamp_micros($"us")).drop("us")
      val binned = RangeJoin.rangeJoin(l, r, Seq("k"), "ts", "ts",
          lowerUs, upperUs, rValueCols = Seq("rid"))
        .select($"lid", $"r_rid").as[(Long, Long)].collect().toSet
      val naive = l.join(r.select($"k", $"ts".as("rts"), $"rid"), Seq("k"))
        .filter(unix_micros($"rts") - unix_micros($"ts") >= lowerUs &&
          unix_micros($"rts") - unix_micros($"ts") < upperUs)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      assert(binned == naive, s"interval [$lowerUs, $upperUs)")
    }
  }

  test("precedingWindowStats keeps unmatched left rows with zero counts") {
    val left = Seq((1L, ts(10), 7L), (9L, ts(10), 8L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(9), 2.5), (1L, ts(8), 1.5))
      .toDF("user_id", "ts", "value")
    val got = RangeJoin.precedingWindowStats(left, right, Seq("user_id"),
        "ts", "ts", windowUs = 60 * MinUs, valueCol = "value")
      .select($"event_id", $"n_matched", $"matched_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((7L, 2L, 4.0), (8L, 0L, 0.0)))
  }
}
