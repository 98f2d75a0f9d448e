package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference engine is strictly batch-iterative (SURVEY.md §2.2 —
  * streaming is absent); this module is the training-pipeline
  * extension. [[windowedCounts]] runs unchanged over a `readStream`
  * source and a batch DataFrame; the stateful ops come in explicit
  * pairs ([[sessionize]] streaming / [[sessionizeBatch]] batch —
  * flatMapGroupsWithState on a BATCH frame would silently drop each
  * user's trailing open session, since batch execution never fires
  * timeouts). Specs verify streaming output == the batch face.
  *
  * Scale notes: both aggregations are keyed by (window/user) and
  * partial-aggregate before the shuffle; state is bounded by the
  * watermark (windowed agg) / gap timeout (sessionize), so a
  * 1000-executor streaming job holds O(active keys) state, not
  * O(history).
  */
object EventStream extends Serializable {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           total_value: Double)

  // NOT private: the state encoder's generated code must reach the
  // accessors from outside this object's scope. start/last are exact
  // MICROSECONDS since epoch.
  final case class SessionState(start: Long, last: Long, n: Long,
                                total: Double)

  /** ns-as-long → µs event time (legacy TIMESTAMP(NANOS) parquet read
    * under `spark.sql.legacy.parquet.nanosAsLong`). Truncating integer
    * division to microseconds matches DuckDB's ns→µs cast, so oracle
    * SQL and Spark agree bit-for-bit. */
  def eventTime(tsNanos: Column): Column =
    // decimal division keeps all 19 digits (a double round-trip would
    // lose sub-µs precision above 2^53) and its long-cast truncates
    // like DuckDB's ns→µs conversion
    timestamp_micros((tsNanos.cast("decimal(20,0)") / lit(1000)).cast("long"))

  /** Read the events table with a proper µs event-time column,
    * negotiating the timestamp unit from the FILE schema rather than
    * assuming one producer: `timestamp[us]` (the current testdata
    * shape — read as TIMESTAMP or TIMESTAMP_NTZ) passes through as a
    * session-TZ timestamp, a nanosecond LONG (legacy TIMESTAMP(NANOS)
    * under `nanosAsLong`) takes the truncating ns→µs path, and a
    * ms/µs epoch long is rejected loudly rather than mis-scaled. A
    * real ingest layer must do this negotiation — upstream producers
    * change units without warning (exactly what happened between
    * rounds 10 and 11). */
  def eventsTable(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", adaptTs(raw.schema("ts").dataType))
  }

  /** The unit-negotiating `ts` adapter, shared by the batch reader
    * above and the streaming reader ([[StreamHarness.eventsStream]]). */
  def adaptTs(dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    dt match {
      case TimestampType    => col("ts")
      case TimestampNTZType =>
        // session TZ is UTC in every entry point, so this cast is a
        // pure type adaptation: the wall-clock digits become the same
        // µs instant DuckDB's no-TZ TIMESTAMP carries
        col("ts").cast(TimestampType)
      case LongType         =>
        // magnitude sanity guard (r12 advice): a ns-epoch for any date
        // in 1971..2200 is >= ~3.2e16, while a µs- or ms-unit epoch for
        // the same range is 3-6 orders of magnitude smaller. Without
        // this, a producer switching to µs-unit INT64 would sail
        // through the ns→µs division and land 1000× off — exactly the
        // silent mis-scaling the negotiation exists to prevent. Fail
        // per-row and loudly instead.
        val minNs = 31536000000000000L // 1971-01-01T00:00Z in ns
        val maxNs = 7258118400000000000L // 2200-01-01T00:00Z in ns
        when(col("ts").isNull, lit(null).cast(TimestampType))
          .when(col("ts").between(minNs, maxNs), eventTime(col("ts")))
          .otherwise(raise_error(concat(
            lit("events.ts: long value "), col("ts").cast("string"),
            lit(" is not a plausible ns-epoch (1971..2200) — did the" +
              " producer switch to ms/µs units?"))).cast(TimestampType))
      case other => sys.error(
        s"events.ts: unsupported type $other (expected timestamp or ns-long)")
    }
  }

  /** Tumbling-window counts and value totals per event type. Works on
    * a streaming OR batch frame; with streaming input the watermark
    * bounds state and admits late events up to `watermarkDelay`. */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
                     watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"),
        col("total_value").cast("double").as("total_value"))

  /** SLIDING-window aggregation: each event lands in window/slide
    * overlapping windows (the alerting/dashboard shape — a 1 h metric
    * refreshed every 15 min). Same columns and decimal discipline as
    * [[windowedCounts]]; the only physical difference is the
    * `window()` expression exploding each row into its
    * (windowDur / slideDur) member windows BEFORE the partial
    * aggregation — map-side fan-out, the exchange still carries one
    * row per (window, type) group. Runs identically on batch and
    * readStream input. */
  def slidingCounts(events: DataFrame, windowDur: String = "1 hour",
                    slideDur: String = "15 minutes",
                    watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur, slideDur).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"),
        col("total_value").cast("double").as("total_value"))

  /** Exact microseconds since epoch of a Timestamp (getTime alone
    * truncates to ms — gap comparisons must match the batch/oracle
    * epoch_us arithmetic exactly). */
  private def micros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming sessionization: consecutive events of a user belong to
    * one session while the gap stays below `gapMs`; a session closes
    * (and is emitted) when the event-time watermark passes its gap
    * timeout, or mid-batch when a later event arrives beyond the gap.
    * Custom state via flatMapGroupsWithState — the engine's
    * KeyValueGroupedDataset state-store surface. Gap math runs on
    * exact microseconds (state stores µs), so the session boundaries
    * and emitted timestamps equal [[sessionizeBatch]]'s bit-for-bit
    * for events the watermark admits, with two inherent append-mode
    * caveats: (a) events more than `watermarkDelay` out of order are
    * dropped as late (every watermarked op diverges there); (b) an
    * admitted late event can extend the OPEN session backward (state
    * start updates), but cannot merge into or reopen a session already
    * emitted — pre-open late events instead form their own past
    * session(s), gap-grouped among themselves per batch semantics.
    *
    * @param watermarkDelay applied only when the input has no
    *        watermark on `ts` yet; a chained upstream watermark (e.g.
    *        from [[streamingDedup]]) is reused as-is and its delay
    *        governs lateness admission. */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L

    def close(u: Long, s: SessionState): Session =
      Session(u, tsOfMicros(s.start), tsOfMicros(s.last), s.n, s.total)

    def fn(user: Long, it: Iterator[Event],
           state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(user, _))
        state.remove()
        out.iterator
      } else {
        val sorted = it.toVector.sortBy(e => (micros(e.ts), e.event_id))
        val closed = Vector.newBuilder[Session]
        var cur = state.getOption
        // session being assembled from admitted late events wholly
        // BEFORE the open session: consecutive sorted pre-start events
        // within gapUs of each other form ONE past session (not one
        // singleton each), matching the batch window-function grouping
        var past: Option[SessionState] = None
        def flushPast(): Unit = past.foreach { p =>
          closed += close(user, p); past = None
        }
        sorted.foreach { e =>
          val t = micros(e.ts)
          cur match {
            // within the gap of the open session on EITHER side: a
            // cross-batch out-of-order event with t < s.start extends
            // the session backward (s.start updates), matching the
            // batch window-function semantics
            case Some(s) if t - s.last <= gapUs && s.start - t <= gapUs =>
              cur = past match {
                // this event also chains off the pending past session:
                // past + event + open collapse into one session (batch
                // parity — the gap chain is unbroken through the event)
                case Some(p) if t - p.last <= gapUs =>
                  past = None
                  Some(SessionState(math.min(p.start, math.min(s.start, t)),
                    math.max(s.last, t), p.n + s.n + 1,
                    p.total + s.total + e.value))
                case _ =>
                  flushPast()
                  Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1, s.total + e.value))
              }
            case Some(s) if t - s.last > gapUs =>
              flushPast()
              closed += close(user, s)
              cur = Some(SessionState(t, t, 1, e.value))
            // t < s.start - gapUs: an admitted-but-late event wholly
            // before the open session — grows the past session while
            // the gap chain holds, else flushes it and starts anew
            case Some(_) =>
              past match {
                case Some(p) if t - p.last <= gapUs =>
                  past = Some(SessionState(p.start, t, p.n + 1,
                    p.total + e.value))
                case _ =>
                  flushPast()
                  past = Some(SessionState(t, t, 1, e.value))
              }
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        flushPast()
        cur.foreach { s =>
          state.update(s)
          // timeout API is ms-granular: round UP so it never fires
          // before the µs-exact gap has elapsed
          state.setTimeoutTimestamp(math.floorDiv(s.last + gapUs + 999L, 1000L))
        }
        closed.result().iterator
      }
    }

    // reuse an upstream watermark ON ts if one exists: Spark 4 forbids
    // redefining it, and chained stateful ops (streamingDedup |>
    // sessionize) legitimately share one event-time watermark. NOTE:
    // when reused, the UPSTREAM delay governs lateness admission — the
    // watermarkDelay argument is ignored (documented in the scaladoc).
    // A watermark on some OTHER column does not count: timeouts must
    // key off ts, so we still apply ours and let Spark surface the
    // conflict rather than silently timing out on the wrong column.
    val hasTsWatermark = events.queryExecution.analyzed.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
          if w.eventTime.name == "ts" => w
    }.isDefined
    val src =
      if (hasTsWatermark) events else events.withWatermark("ts", watermarkDelay)
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming exact-dedup: drop rows whose dedup key was already seen
    * within the watermark horizon — the incremental counterpart of
    * `Dedup.exactDedup` for a document ingest stream (state is bounded
    * by the watermark; an unbounded `dropDuplicates` would grow state
    * forever at 100 TB/day). Works on any streaming frame with an
    * event-time column. Survivor semantics differ from the batch op:
    * streaming keeps the FIRST ARRIVAL per key (arrival-order
    * dependent), batch keeps the min-id canonical — dedup-set
    * membership matches, the surviving representative may not. */
  def streamingDedup(stream: DataFrame, keyCol: String, tsCol: String,
                     watermarkDelay: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Stream-stream interval join: each purchase pairs with the same
    * user's views in the strictly-preceding `windowDur` — the
    * streaming face of `operators.RangeJoin` (whose batch binning is
    * unnecessary here: Spark's stream-stream join buffers both sides
    * in the state store and the time-range condition + watermarks
    * bound retention — a view is evicted once the purchase-side
    * watermark passes `v_ts + windowDur`, so state is O(window), not
    * O(history)). Both inputs need an event-time `ts` column; works
    * on batch frames too (same plan minus state).
    *
    * @param joinType "inner" (default) emits matched pairs only;
    *        "left_outer" additionally emits each UNMATCHED purchase
    *        null-extended — but only once the watermark proves no
    *        qualifying view can still arrive (a view must carry
    *        `v_ts < p_ts`, and views below the watermark are dropped
    *        as late, so a purchase with `p_ts <= watermark` is final).
    *        The null row therefore trails the purchase by up to the
    *        watermark delay — the inherent outer-join latency of
    *        stream-stream joins; state stays O(window) either way.
    * @return (event_id, user_id, p_ts, v_ts, value) — one row per
    *         (purchase, qualifying view) pair, append-mode safe. */
  def streamAttribution(purchases: DataFrame, views: DataFrame,
                        watermarkDelay: String = "10 minutes",
                        windowDur: String = "1 hour",
                        joinType: String = "inner"): DataFrame = {
    val isStreaming = purchases.isStreaming
    def wm(df: DataFrame) =
      if (isStreaming) df.withWatermark("ts", watermarkDelay) else df
    val p = wm(purchases)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id"))
    val v = wm(views)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("value"))
    // STRICT bounds on both ends (v_ts ∈ (p_ts - window, p_ts)) —
    // identical to RangeJoin.precedingWindowStats' (-windowUs, 0)
    // interval, so the two faces agree at the window boundary
    p.join(v, col("p_user") === col("v_user") &&
        col("v_ts") < col("p_ts") &&
        col("v_ts") > col("p_ts") - expr(s"INTERVAL $windowDur"), joinType)
      // coalesce is a no-op for inner/left (p_user never null there);
      // for full_outer it keeps the user on view-only rows
      .select(col("event_id"),
        coalesce(col("p_user"), col("v_user")).as("user_id"),
        col("p_ts"), col("v_ts"), col("value"))
  }

  /** Start an exactly-once partitioned parquet sink for a streaming
    * frame: the file-sink commit log under `checkpointDir` records
    * committed files per epoch, so restarts neither drop nor duplicate
    * batches, and `partitionCols` lays the output out for directory
    * pruning (`sources.TableLayout` semantics) — the standard
    * streaming-ingest-to-corpus pattern. Caller stops the returned
    * query (or awaits termination). */
  def startParquetSink(df: DataFrame, path: String, checkpointDir: String,
                       partitionCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .start()
  }

  /** Batch sessionization — identical semantics to [[sessionize]]
    * expressed with window functions (gap-break flags → running
    * session number): the oracle-checkable face of the same operator. */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // integer microseconds on both sides: exact, and identical to the
    // DuckDB oracle's epoch_us arithmetic (a double-seconds comparison
    // would round differently near the gap boundary)
    val prevUs = lag(unix_micros(col("ts")), 1).over(byUser)
    val isBreak = when(prevUs.isNull ||
      unix_micros(col("ts")) - prevUs > gapMs * 1000L, 1L)
      .otherwise(0L)
    events
      .withColumn("brk", isBreak)
      .withColumn("session_no", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("user_id"), col("session_no"), col("session_start"),
        col("session_end"), col("n_events"), col("total_value"))
  }
}
