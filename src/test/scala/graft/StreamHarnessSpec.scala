package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStream, StreamHarness}

/** The bounded streaming faces must equal their batch twins on real
  * testdata — the same equivalences the driver's oracle checks at
  * sf0.01, pinned here at sf0.001 so `sbt test` catches a drift
  * without the DuckDB harness. */
class StreamHarnessSpec extends AnyFunSuite with SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("bounded streaming windowed counts == batch windowedCounts") {
    val streamed = StreamHarness.boundedWindowedCounts(spark, dir)
    val batch = EventStream.windowedCounts(EventStream.eventsTable(spark, dir))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("bounded drains restore the session confs they flip " +
       "(ephemeral-checkpoint scope, r18)") {
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled")
    val before = keys.map(k => spark.conf.getOption(k))
    StreamHarness.boundedWindowedCounts(spark, dir).count()
    assert(keys.map(k => spark.conf.getOption(k)) == before,
      "a bounded drain leaked its scoped streaming confs into the session")
  }

  test("bounded streaming sliding windows == batch slidingCounts, and " +
      "each event lands in window/slide windows") {
    val batch = EventStream.slidingCounts(EventStream.eventsTable(spark, dir))
    val streamed = StreamHarness.boundedSlidingCounts(spark, dir)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // overlap factor: total window memberships = 4x the event count
    val nEvents = EventStream.eventsTable(spark, dir).count()
    val members = streamed.agg(sum(col("n_events"))).head().getLong(0)
    assert(members == 4 * nEvents,
      s"expected ${4 * nEvents} window memberships, got $members")
  }

  test("bounded streaming dedup keys == batch DISTINCT") {
    val streamed = StreamHarness.boundedDedupKeys(spark, dir)
    val batch = EventStream.eventsTable(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("bounded stream-stream attribution == batch interval join") {
    val ev = EventStream.eventsTable(spark, dir)
    val batch = EventStream.streamAttribution(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "view"))
    val streamed = StreamHarness.boundedAttribution(spark, dir)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("bounded stream-stream LEFT OUTER join == batch left join on the " +
      "decided region, and null-extends at least one purchase") {
    val ev = EventStream.eventsTable(spark, dir)
    // wm basis = MIN of the per-branch maxima (each withWatermark node
    // tracks its own max ts), not the overall max
    val cutoffUs = StreamHarness.attributionWatermarkUs(spark, dir, 600L) -
      1000000L
    val batch = EventStream.streamAttribution(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "view"),
        joinType = "left_outer")
      .filter(unix_micros(col("p_ts")) <= cutoffUs)
    val streamed = StreamHarness.boundedAttributionOuter(spark, dir)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // the outer face earns its keep: unmatched purchases survive
    assert(streamed.filter(col("v_ts").isNull).count() > 0)
    // and the matched subset equals the inner face on the same region
    val inner = StreamHarness.boundedAttribution(spark, dir)
      .filter(unix_micros(col("p_ts")) <= cutoffUs)
    val matched = streamed.filter(col("v_ts").isNotNull)
    assert(matched.count() == inner.count())
    assert(matched.exceptAll(inner).isEmpty && inner.exceptAll(matched).isEmpty)
  }

  test("foreachBatch CDC-apply converges to the single-batch upsert") {
    import graft.operators.Snapshot
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"))
    def v(df: org.apache.spark.sql.DataFrame, ver: Long, del: Boolean) =
      df.select(col("doc_id"), col("lang"), col("source"),
        lit(ver).as("version"), lit(del).as("deleted"))
    val batch = Snapshot.upsert(
      v(d, 1L, del = false),
      v(d.filter(col("doc_id") % 5 === 0)
          .withColumn("lang", lit("und")), 2L, del = false)
        .unionByName(v(d.filter(col("doc_id") % 17 === 0), 3L, del = true))
        .unionByName(v(d.filter(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L), 1L, del = false)),
      "doc_id", "version", deletedCol = "deleted")
    val streamed = StreamHarness.cdcApplyFace(spark, dir)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("bounded streaming sessions == batch sessions on the closed region") {
    val gapMs = 6L * 3600000
    val delaySec = 600L
    val streamed = StreamHarness.boundedSessions(spark, dir, gapMs, delaySec)
    val maxUs = EventStream.eventsTable(spark, dir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val cutoffUs = maxUs - delaySec * 1000000L - gapMs * 1000L - 1000000L
    val batch = EventStream.sessionizeBatch(
        EventStream.eventsTable(spark, dir), gapMs)
      .filter(unix_micros(col("session_end")) <= cutoffUs)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
    assert(streamed.count() > 0, "closed region must be non-empty")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("native session_window sessions == custom sessionize on the " +
      "shared closed region (start/count agree; native end = last + gap)") {
    val native = StreamHarness.boundedNativeSessions(spark, dir)
    val custom = StreamHarness.boundedSessions(spark, dir,
      gapMs = 6L * 3600000, delaySec = 600)
    // custom's region is TIGHTER (cutoff subtracts the gap twice over
    // native's, since its end lacks the gap): compare on custom's
    // region, where both faces are decided. At µs-resolution data no
    // inter-event gap is exactly 6h, so the >= vs > split boundary
    // cannot bite and the session SETS must agree.
    val nOnRegion = native
      .withColumn("last_ts",
        timestamp_micros(unix_micros(col("session_end")) - 21600000000L))
      .join(custom.select(col("user_id"), col("session_start")),
        Seq("user_id", "session_start"))
    assert(nOnRegion.count() == custom.count(),
      "session starts disagree between native and custom on the region")
    val mism = nOnRegion
      .join(custom.withColumnRenamed("session_end", "c_end")
          .withColumnRenamed("n_events", "c_n"),
        Seq("user_id", "session_start"))
      .filter(col("last_ts") =!= col("c_end") ||
        col("n_events") =!= col("c_n"))
    assert(mism.isEmpty, "native (end-gap, n) != custom (end, n)")
  }

  test("checkpoint stop-resume (window state) == single bounded run") {
    val dir = "/root/testdata/sf0.001"
    val resumed = StreamHarness.resumedWindowedCounts(spark, dir)
      .orderBy("window_start", "event_type").collect().toSeq
    val single = StreamHarness.boundedWindowedCounts(spark, dir)
      .orderBy("window_start", "event_type").collect().toSeq
    assert(resumed == single,
      "recovered window state diverges from the single-run aggregation")
  }

  test("checkpoint stop-resume (custom SessionState) == single bounded " +
       "run on the closed region") {
    val dir = "/root/testdata/sf0.001"
    val gap = 6L * 3600000
    val resumed = StreamHarness.resumedSessions(spark, dir, gap, 600)
      .orderBy("user_id", "session_start").collect().toSeq
    val single = StreamHarness.boundedSessions(spark, dir, gap, 600)
      .orderBy("user_id", "session_start").collect().toSeq
    assert(resumed == single,
      "restored SessionState diverges from the single-run sessionization")
  }

  test("bounded stream-static enrichment == batch left join") {
    val ev = EventStream.eventsTable(spark, dir)
    val ltv = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,6)")).as("ltv"))
    val batch = ev.filter(col("event_type") === "view")
      .join(ltv, Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"),
        col("ltv").cast("double").as("user_ltv"))
    val streamed = StreamHarness.boundedEnrichment(spark, dir)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("bounded stream-stream FULL OUTER join == batch full join on the " +
      "decided region, null-extending BOTH sides") {
    val ev = EventStream.eventsTable(spark, dir)
    // per-side decision bounds (measured eviction semantics — see
    // boundedAttributionFull): purchase side wm − 1s, view side
    // wm − window − 1s
    val wmUs = StreamHarness.attributionWatermarkUs(spark, dir, 600L)
    val pCutUs = wmUs - 1000000L
    val vCutUs = wmUs - 3600L * 1000000L - 1000000L
    val batch = EventStream.streamAttribution(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "view"),
        joinType = "full_outer")
      .filter(
        (col("p_ts").isNotNull && unix_micros(col("p_ts")) <= pCutUs) ||
        (col("p_ts").isNull && unix_micros(col("v_ts")) <= vCutUs))
    val streamed = StreamHarness.boundedAttributionFull(spark, dir)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.filter(col("v_ts").isNull).count() > 0,
      "no view-side null-extension — full face adds nothing over inner")
    assert(streamed.filter(col("p_ts").isNull).count() > 0,
      "no purchase-side null-extension — full face adds nothing over left")
    // the matched subset equals the inner face on the same region
    val inner = StreamHarness.boundedAttribution(spark, dir)
      .filter(unix_micros(col("p_ts")) <= pCutUs)
    val matched = streamed.filter(col("p_ts").isNotNull && col("v_ts").isNotNull)
    assert(matched.count() == inner.count())
    assert(matched.exceptAll(inner).isEmpty && inner.exceptAll(matched).isEmpty)
  }

  test("chained stateful ops (stream-stream join → windowed agg) == " +
      "batch join+agg on the propagated-watermark region") {
    val ev = EventStream.eventsTable(spark, dir)
    val cutUs = StreamHarness.attributionWatermarkUs(spark, dir, 600L) -
      3600L * 1000000L - 1000000L
    val batch = EventStream.streamAttribution(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "view"))
      .groupBy(window(col("p_ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("pairs"),
        sum(col("value").cast("decimal(18,6)")).as("view_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("pairs"), col("view_value").cast("double").as("view_value"))
      .filter(unix_micros(col("w_end")) <= cutUs)
    val streamed = StreamHarness.boundedChainedAgg(spark, dir)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() > 0, "no closed windows emitted — face is vacuous")
  }

  test("watermark late-drop face == batch closed-window aggregate over " +
      "on-time rows only") {
    val ev = EventStream.eventsTable(spark, dir)
    val b = ev.agg(min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx")).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val cut = mn + (mx - mn) * 7L / 10L
    val wmMs = mx / 1000L - 2L * 3600L * 1000L
    // batch twin: on-time rows, windows closed by the final watermark
    val batch = EventStream.windowedCounts(
        ev.filter(unix_micros(col("ts")) > cut))
      .filter(unix_micros(col("window_end")) / 1000L <= wmMs)
    val streamed = StreamHarness.lateDropFace(spark, dir)
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // the face's internal require already pinned the drop METRIC to
    // the predicted distinct evicted (window, event_type) keys; here
    // pin that late windows really are absent from the output
    val lateWindows = EventStream.windowedCounts(
        ev.filter(unix_micros(col("ts")) <= cut))
      .select(col("window_start")).distinct()
    val leaked = streamed.join(
      lateWindows.except(
        EventStream.windowedCounts(ev.filter(unix_micros(col("ts")) > cut))
          .select(col("window_start")).distinct()),
      Seq("window_start")).count()
    assert(leaked == 0, "late-only windows leaked into the append output")
  }

}
