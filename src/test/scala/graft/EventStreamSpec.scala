package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class EventStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // epoch 0 would equal Spark's initial watermark and be dropped as
  // late — anchor the fixture at a realistic base time
  private val Base = 1700000000000L
  private def ts(minutes: Long): Timestamp = new Timestamp(Base + minutes * 60000L)

  private val fixture = Seq(
    // user 1: two sessions (gap 30min closes after 45min silence)
    Event(1, ts(0), 1L, "view", 1.0),
    Event(2, ts(10), 1L, "click", 2.0),
    Event(3, ts(70), 1L, "view", 3.0),
    // user 2: one session
    Event(4, ts(5), 2L, "purchase", 10.0),
    Event(5, ts(20), 2L, "view", 1.5))

  test("windowedCounts: streaming output equals batch run of the same transform") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.windowedCounts(mem.toDF(), "1 hour", "5 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      val streamed = spark.table("wc")
        .as[(Timestamp, Timestamp, String, Long, Double)].collect().toSet
      val batch = EventStream.windowedCounts(fixture.toDF(), "1 hour", "5 minutes")
        .as[(Timestamp, Timestamp, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
      // window boundaries are hour-aligned
      assert(batch.forall { case (s, e, _, _, _) =>
        s.getTime % 3600000L == 0 && e.getTime - s.getTime == 3600000L })
    } finally q.stop()
  }

  test("sessionize (streaming state) emits gap-closed sessions; " +
       "matches sessionizeBatch semantics") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val gapMs = 30L * 60000
    val q = EventStream.sessionize(mem.toDS(), gapMs)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      // advance watermark far past all timeouts to flush open sessions
      mem.addData(Event(99, ts(10000), 9L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100, ts(20000), 9L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess")
        .as[EventStream.Session].collect()
        .filter(_.user_id != 9L)
        .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime,
          s.n_events, s.total_value)).toSet
      val expected = Set(
        (1L, ts(0).getTime, ts(10).getTime, 2L, 3.0),
        (1L, ts(70).getTime, ts(70).getTime, 1L, 3.0),
        (2L, ts(5).getTime, ts(20).getTime, 2L, 11.5))
      assert(streamed == expected)

      val batch = EventStream.sessionizeBatch(fixture.toDF(), gapMs)
        .select($"user_id", $"session_start", $"session_end", $"n_events",
          $"total_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
        .map(s => (s._1, s._2.getTime, s._3.getTime, s._4, s._5)).toSet
      assert(batch == expected)
    } finally q.stop()
  }

  test("sessionize: admitted cross-batch out-of-order event extends the " +
       "open session BACKWARD (batch-parity session_start)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val gapMs = 30L * 60000
    val q = EventStream.sessionize(mem.toDS(), gapMs, "30 minutes")
      .writeStream.format("memory").queryName("sess_ooo").outputMode("append")
      .start()
    try {
      // batch 1: session opens at ts(60); watermark → ts(30)
      mem.addData(Event(1, ts(60), 1L, "view", 1.0))
      q.processAllAvailable()
      // batch 2: t=ts(55) is admitted (> watermark) and within the gap
      // BEFORE the session start → start must move back to ts(55)
      mem.addData(Event(2, ts(55), 1L, "view", 2.0))
      q.processAllAvailable()
      // flush via far-future events for another user
      mem.addData(Event(99, ts(10000), 9L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100, ts(20000), 9L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_ooo").as[EventStream.Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.session_start.getTime, s.session_end.getTime,
          s.n_events, s.total_value)).toSet
      assert(got == Set((ts(55).getTime, ts(60).getTime, 2L, 3.0)))
      // identical to the batch face over the same admitted events
      val batch = EventStream.sessionizeBatch(
          Seq(Event(1, ts(60), 1L, "view", 1.0),
            Event(2, ts(55), 1L, "view", 2.0)).toDF(), gapMs)
        .select($"session_start", $"session_end", $"n_events", $"total_value")
        .as[(Timestamp, Timestamp, Long, Double)].collect()
        .map(r => (r._1.getTime, r._2.getTime, r._3, r._4)).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("sessionize: admitted late event wholly before the open session " +
       "becomes its own past session") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val gapMs = 2L * 60000 // 2-min gap, 60-min watermark: late != gap-near
    val q = EventStream.sessionize(mem.toDS(), gapMs, "60 minutes")
      .writeStream.format("memory").queryName("sess_past").outputMode("append")
      .start()
    try {
      mem.addData(Event(1, ts(60), 1L, "view", 1.0))
      q.processAllAvailable()
      // ts(50): admitted (watermark = ts(0)), but 10 min before the open
      // session with a 2-min gap → emitted as its own singleton session
      mem.addData(Event(2, ts(50), 1L, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(99, ts(10000), 9L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100, ts(20000), 9L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_past").as[EventStream.Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.session_start.getTime, s.session_end.getTime,
          s.n_events, s.total_value)).toSet
      assert(got == Set(
        (ts(50).getTime, ts(50).getTime, 1L, 2.0),
        (ts(60).getTime, ts(60).getTime, 1L, 1.0)))
    } finally q.stop()
  }

  test("sessionize: multiple pre-open late events within gap of each other " +
       "form ONE past session (batch-parity grouping)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val gapMs = 2L * 60000 // 2-min gap, 60-min watermark
    val q = EventStream.sessionize(mem.toDS(), gapMs, "60 minutes")
      .writeStream.format("memory").queryName("sess_past2").outputMode("append")
      .start()
    try {
      mem.addData(Event(1, ts(60), 1L, "view", 1.0))
      q.processAllAvailable()
      // one batch of admitted-late events wholly before the open session:
      // ts(50), ts(51), ts(52) chain within the 2-min gap → ONE session;
      // ts(40) is gap-separated from them → its own session
      mem.addData(Event(2, ts(40), 1L, "view", 4.0),
        Event(3, ts(50), 1L, "view", 2.0),
        Event(4, ts(51), 1L, "view", 3.0),
        Event(5, ts(52), 1L, "view", 5.0))
      q.processAllAvailable()
      mem.addData(Event(99, ts(10000), 9L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100, ts(20000), 9L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_past2").as[EventStream.Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.session_start.getTime, s.session_end.getTime,
          s.n_events, s.total_value)).toSet
      assert(got == Set(
        (ts(40).getTime, ts(40).getTime, 1L, 4.0),
        (ts(50).getTime, ts(52).getTime, 3L, 10.0),
        (ts(60).getTime, ts(60).getTime, 1L, 1.0)))
    } finally q.stop()
  }

  test("sessionize: TWO pre-open late events within gap merge into ONE " +
       "past session (batch parity, ADVICE r3 medium)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val gapMs = 2L * 60000 // 2-min gap, 60-min watermark
    val q = EventStream.sessionize(mem.toDS(), gapMs, "60 minutes")
      .writeStream.format("memory").queryName("sess_two_late")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(60), 1L, "view", 1.0))
      q.processAllAvailable()
      // exactly the reported scenario: two admitted late events, both
      // wholly before the open session, within gapUs of each other —
      // they must emit as ONE merged session, not two singletons
      mem.addData(Event(2, ts(50), 1L, "view", 2.0),
        Event(3, ts(51), 1L, "view", 3.0))
      q.processAllAvailable()
      mem.addData(Event(99, ts(10000), 9L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100, ts(20000), 9L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_two_late").as[EventStream.Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime,
          s.n_events, s.total_value)).toSet
      // batch face over the same admitted events defines the contract
      val batch = EventStream.sessionizeBatch(
          Seq(Event(1, ts(60), 1L, "view", 1.0),
            Event(2, ts(50), 1L, "view", 2.0),
            Event(3, ts(51), 1L, "view", 3.0)).toDF(), gapMs)
        .select($"user_id", $"session_start", $"session_end", $"n_events",
          $"total_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
        .map(r => (r._1, r._2.getTime, r._3.getTime, r._4, r._5)).toSet
      assert(batch == Set(
        (1L, ts(50).getTime, ts(51).getTime, 2L, 5.0),
        (1L, ts(60).getTime, ts(60).getTime, 1L, 1.0)))
      assert(got == batch)
    } finally q.stop()
  }

  test("sessionize: late events chaining through the gap INTO the open " +
       "session merge past+event+open into one session") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val gapMs = 2L * 60000
    val q = EventStream.sessionize(mem.toDS(), gapMs, "60 minutes")
      .writeStream.format("memory").queryName("sess_bridge").outputMode("append")
      .start()
    try {
      mem.addData(Event(1, ts(60), 1L, "view", 1.0))
      q.processAllAvailable()
      // ts(57), ts(58), ts(59): each within 2 min of the next, and ts(59)
      // is within the gap of the open session's start ts(60) → the whole
      // chain merges into ONE session [ts(57), ts(60)]
      mem.addData(Event(2, ts(57), 1L, "view", 2.0),
        Event(3, ts(58), 1L, "view", 3.0),
        Event(4, ts(59), 1L, "view", 4.0))
      q.processAllAvailable()
      mem.addData(Event(99, ts(10000), 9L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100, ts(20000), 9L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_bridge").as[EventStream.Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.session_start.getTime, s.session_end.getTime,
          s.n_events, s.total_value)).toSet
      assert(got == Set((ts(57).getTime, ts(60).getTime, 4L, 10.0)))
      // batch face over the same admitted events agrees
      val batch = EventStream.sessionizeBatch(
          Seq(Event(1, ts(60), 1L, "view", 1.0),
            Event(2, ts(57), 1L, "view", 2.0),
            Event(3, ts(58), 1L, "view", 3.0),
            Event(4, ts(59), 1L, "view", 4.0)).toDF(), gapMs)
        .select($"session_start", $"session_end", $"n_events", $"total_value")
        .as[(Timestamp, Timestamp, Long, Double)].collect()
        .map(r => (r._1.getTime, r._2.getTime, r._3, r._4)).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("composition: streamingDedup |> sessionize runs as ONE streaming " +
       "query; duplicate events don't inflate sessions") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val gapMs = 30L * 60000
    // exact-dedup on event_id feeding stateful sessionization — the
    // two stateful operators chain inside a single streaming plan
    // (dedup state + session state, each watermark-bounded)
    val deduped = EventStream
      .streamingDedup(mem.toDF(), "event_id", "ts", "60 minutes")
      .as[Event]
    val q = EventStream.sessionize(deduped, gapMs, "60 minutes")
      .writeStream.format("memory").queryName("dedup_sess")
      .outputMode("append").start()
    try {
      // event 2 arrives twice (an at-least-once source retry) — the
      // session must count it once
      mem.addData(Event(1, ts(0), 1L, "view", 1.0),
        Event(2, ts(10), 1L, "click", 2.0),
        Event(2, ts(10), 1L, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(99, ts(10000), 9L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100, ts(20000), 9L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("dedup_sess").as[EventStream.Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.session_start.getTime, s.session_end.getTime,
          s.n_events, s.total_value)).toSet
      assert(got == Set((ts(0).getTime, ts(10).getTime, 2L, 3.0)))
    } finally q.stop()
  }

  test("streamingDedup drops in-watermark duplicates, keeps distinct keys") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventStream.streamingDedup(
      mem.toDF().withColumn("fp", col("event_type")), "fp", "ts")
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1L, "viewX", 1.0),
        Event(2, ts(1), 2L, "viewX", 2.0),  // dup key within watermark
        Event(3, ts(2), 3L, "clickX", 3.0))
      q.processAllAvailable()
      val kept = spark.table("dedup").select("event_id")
        .as[Long].collect().toSet
      assert(kept == Set(1L, 3L)) // first viewX and the distinct clickX
    } finally q.stop()
  }

  test("streamAttribution: stream-stream interval join equals batch face " +
       "and the binned RangeJoin") {
    implicit val sql = spark.sqlContext
    val pMem = MemoryStream[Event]
    val vMem = MemoryStream[Event]
    val q = EventStream.streamAttribution(pMem.toDF(), vMem.toDF(),
        watermarkDelay = "5 minutes", windowDur = "1 hour")
      .writeStream.format("memory").queryName("attr").outputMode("append")
      .start()
    try {
      val purchases = Seq(
        Event(100, ts(90), 1L, "purchase", 50.0),
        Event(101, ts(200), 1L, "purchase", 60.0), // no view in window
        Event(102, ts(61), 2L, "purchase", 70.0))
      val views = Seq(
        Event(1, ts(35), 1L, "view", 1.0),   // 55min before 100: in
        Event(2, ts(89), 1L, "view", 2.0),   // 1min before 100: in
        Event(3, ts(90), 1L, "view", 3.0),   // simultaneous: out (strict)
        Event(4, ts(30), 2L, "view", 4.0),   // 31min before 102: in
        Event(5, ts(120), 9L, "view", 5.0),  // other user
        Event(6, ts(30), 1L, "view", 6.0))   // EXACTLY 1h before 100: out
      pMem.addData(purchases: _*)
      vMem.addData(views: _*)
      q.processAllAvailable()
      val streamed = spark.table("attr")
        .select($"event_id", $"user_id", $"v_ts", $"value")
        .as[(Long, Long, Timestamp, Double)].collect().toSet
      assert(streamed == Set(
        (100L, 1L, ts(35), 1.0), (100L, 1L, ts(89), 2.0),
        (102L, 2L, ts(30), 4.0)))
      // batch face of the same operator: identical pairs
      val batch = EventStream.streamAttribution(
          purchases.toDF(), views.toDF())
        .select($"event_id", $"user_id", $"v_ts", $"value")
        .as[(Long, Long, Timestamp, Double)].collect().toSet
      assert(batch == streamed)
      // and the binned batch range join agrees (both faces use the
      // strictly-open interval (p_ts - 1h, p_ts))
      val binned = graft.operators.RangeJoin.rangeJoin(
          purchases.toDF().select($"user_id", $"ts", $"event_id"),
          views.toDF().select($"user_id", $"ts", $"value"),
          Seq("user_id"), "ts", "ts",
          lowerUs = -3600L * 1000000 + 1, upperUs = 0, rValueCols = Seq("value"))
        .select($"event_id", $"user_id", $"r_ts", $"r_value")
        .as[(Long, Long, Timestamp, Double)].collect().toSet
      assert(binned == streamed)
    } finally q.stop()
  }

  test("startParquetSink writes exactly-once partitioned files a batch " +
       "reader can prune") {
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[Event]
    val q = EventStream.startParquetSink(mem.toDF(), s"$root/data",
      s"$root/ckpt", partitionCols = Seq("event_type"))
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      mem.addData(Event(6, ts(80), 1L, "view", 4.0))
      q.processAllAvailable()
      val back = spark.read.parquet(s"$root/data")
      assert(back.count() == fixture.size + 1)
      // hive layout materialized per event_type → pruned reads
      // (inputFiles ignores filters; assert on the executed scan)
      val filtered = back.filter($"event_type" === "view")
      filtered.collect()
      val scans = filtered.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty)
      assert(new java.io.File(s"$root/data/event_type=view").isDirectory)
      // restart against the same checkpoint replays nothing
      val q2 = EventStream.startParquetSink(mem.toDF(), s"$root/data",
        s"$root/ckpt", partitionCols = Seq("event_type"))
      try {
        q2.processAllAvailable()
        assert(spark.read.parquet(s"$root/data").count() == fixture.size + 1)
      } finally q2.stop()
    } finally q.stop()
  }

  test("sessionizeBatch on real events agrees with a serial fold") {
    val events = EventStream.eventsTable(spark, "/root/testdata/sf0.001")
      .limit(2000)
    val gapMs = 6L * 3600000
    val got = EventStream.sessionizeBatch(events, gapMs)
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"),
        sum($"n_events").as("n_events"))
      .as[(Long, Long, Long)].collect()
      .map { case (u, ns, ne) => u -> ((ns, ne)) }.toMap
    val serial = events.select($"user_id", $"ts", $"event_id")
      .as[(Long, Timestamp, Long)].collect()
      .groupBy(_._1).map { case (u, rows) =>
        val sorted = rows.sortBy(r => (r._2.getTime, r._3))
        var sessions = 1L
        sorted.sliding(2).foreach {
          case Array((_, a, _), (_, b, _)) =>
            if (b.getTime - a.getTime > gapMs) sessions += 1
          case _ =>
        }
        u -> ((sessions, rows.length.toLong))
      }
    assert(got == serial)
  }
}
