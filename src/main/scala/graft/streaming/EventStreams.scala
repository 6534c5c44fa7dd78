package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events-shaped stream
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no data streams (SURVEY.md §2.10) — its
  * time-driven behavior is cron + poll loops. This module supplies the
  * streaming capabilities a Spark-native engine should have anyway:
  * watermarked windowed aggregation, declarative session windows, and
  * custom state via mapGroupsWithState. Every transform takes and
  * returns a (streaming) DataFrame, so the same code runs on
  * `readStream` in production and on `availableNow` file streams in
  * tests.
  *
  * Scale posture: windowed counts shuffle once on (window, key) with
  * partial aggregation; state store size is bounded by the watermark
  * horizon; sessionization state is per-user and evicted on timeout.
  */
object EventStreams {

  /** Watermarked tumbling-window counts per event type. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      // decimal-cast before summing: exact and order-independent, so
      // streaming and batch (and any engine) agree bit-for-bit.
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Declarative sessionization: gap-based session windows per user. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("session_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(nEvents: Long, totalValue: Double, lastTs: Long)
  final case class UserActivity(user_id: Long, n_events: Long, total_value: Double)

  /** Custom state via mapGroupsWithState: running per-user activity
    * counters with processing-time timeout — the
    * KeyValueGroupedDataset state path for logic session_window can't
    * express. */
  def userActivity(events: Dataset[Event]): Dataset[UserActivity] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[UserActivity]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout)(
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // idle past the timeout: emit the final totals once and
            // EVICT — without the remove() the state re-arms forever
            // (unbounded store growth + a duplicate row per timeout).
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            state.remove()
            UserActivity(user, prev.nEvents, prev.totalValue)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            var n = prev.nEvents
            var total = prev.totalValue
            var last = prev.lastTs
            rows.foreach { e =>
              n += 1; total += e.value; last = math.max(last, e.ts.getTime)
            }
            state.update(SessionState(n, total, last))
            state.setTimeoutDuration("1 hour")
            UserActivity(user, n, total)
          }
        })
  }

  /** The same running per-user totals as [[userActivity]], on the
    * Spark 4 arbitrary-state API (`transformWithState` /
    * `StatefulProcessor`) — typed state handles with declarative TTL
    * instead of hand-rolled timeout bookkeeping, and room for multiple
    * named states and timers per key. Requires the RocksDB state store
    * provider (the API rejects the default HDFS-backed store); the
    * caller sets `spark.sql.streaming.stateStore.providerClass`. */
  final class UserTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserActivity] {
    @transient private var totals: org.apache.spark.sql.streaming.ValueState[SessionState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      // No TTL: processing-time TTL arms a cleanup timer every batch, so
      // a drain-and-stop run (AvailableNow) keeps scheduling timer-only
      // batches and never terminates — observed as a hard hang in both
      // awaitTermination and processAllAvailable. Idle-user eviction on
      // a continuous deployment belongs to a TTLConfig added there (or
      // the mapGroupsWithState timeout variant, [[userActivity]]).
      totals = getHandle.getValueState[SessionState]("totals",
        Encoders.product[SessionState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserActivity] = {
      val prev = Option(totals.get()).getOrElse(SessionState(0L, 0.0, 0L))
      var n = prev.nEvents
      var total = prev.totalValue
      var last = prev.lastTs
      rows.foreach { e =>
        n += 1; total += e.value; last = math.max(last, e.ts.getTime)
      }
      totals.update(SessionState(n, total, last))
      Iterator.single(UserActivity(user, n, total))
    }
  }

  def userActivityTws(events: Dataset[Event]): Dataset[UserActivity] = {
    implicit val outEnc = Encoders.product[UserActivity]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class SessionLabel(event_id: Long, user_id: Long, sess_id: Long,
      pos_in_sess: Int, since_start_us: Long, sess_n: Long)
  final case class SessionBuffer(sessId: Long, startUs: Long, lastUs: Long,
      eventIds: Array[Long], tsUs: Array[Long])

  /** Streaming twin of the batch per-event sessionization
    * ([[graft.queries.Streams.q112Sessionize]]): labels every event
    * with (session ordinal, position, offset-from-start, session size)
    * and emits the COMPLETE label set for a session the moment the
    * session closes — either a later event opens the next one, or the
    * event-time watermark passes last-event + gap (timeout). The
    * aggregate `session_window` path ([[sessionWindows]]) cannot
    * produce this shape: it has already lost the event ids.
    *
    * Labels are exact integers over epoch-µs, identical to the batch
    * query — closed sessions match q112's rows bit-for-bit
    * (spec-asserted). State per user = the OPEN session's buffered
    * events, evicted on close: bounded by session length, not stream
    * length. Requires time-ordered arrival per user across
    * micro-batches (the file/kafka norm); within a batch order is
    * restored by an explicit sort. */
  def sessionAssignments(events: Dataset[Event], gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[SessionLabel] = {
    implicit val stateEnc = Encoders.product[SessionBuffer]
    implicit val outEnc = Encoders.product[SessionLabel]
    implicit val keyEnc = Encoders.scalaLong
    val gapUs = gapMinutes * 60L * 1000000L

    def labels(b: SessionBuffer, user: Long): Iterator[SessionLabel] = {
      val n = b.eventIds.length.toLong
      (0 until b.eventIds.length).iterator.map { i =>
        SessionLabel(b.eventIds(i), user, b.sessId, i + 1,
          b.tsUs(i) - b.startUs, n)
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[Event], state: GroupState[SessionBuffer]) => {
          if (state.hasTimedOut) {
            // watermark passed last-event + gap: the open session closed
            val b = state.get
            state.remove()
            labels(b, user)
          } else {
            // micro-batch order is arbitrary; session math needs time order
            val sorted = rows.map(e => (unixMicros(e.ts), e.event_id))
              .toArray.sortInPlaceBy(identity)
            var closed = List.empty[SessionBuffer]
            var cur = state.getOption.orNull
            sorted.foreach { case (us, id) =>
              if (cur == null)
                cur = SessionBuffer(1L, us, us, Array(id), Array(us))
              else if (us - cur.lastUs >= gapUs) {
                closed ::= cur
                cur = SessionBuffer(cur.sessId + 1, us, us, Array(id), Array(us))
              } else
                cur = cur.copy(lastUs = us,
                  eventIds = cur.eventIds :+ id, tsUs = cur.tsUs :+ us)
            }
            if (cur != null) {
              val deadlineMs = cur.lastUs / 1000L + gapMinutes * 60L * 1000L
              if (deadlineMs <= state.getCurrentWatermarkMs()) {
                // Already expired vs the watermark: close NOW.
                // EventTimeTimeout rejects a timeout that is not later
                // than the watermark (IllegalArgumentException), so a
                // straggler micro-batch whose events sit older than
                // watermark − gap would otherwise kill the whole query.
                // Closing here is exact, not a shortcut: any future
                // on-time event has ts > watermark ≥ lastUs + gap, so it
                // would open a new session regardless.
                closed ::= cur
                state.remove()
              } else {
                state.update(cur)
                // close via watermark once last + gap passes (millis API)
                state.setTimeoutTimestamp(deadlineMs)
              }
            }
            closed.reverse.iterator.flatMap(b => labels(b, user))
          }
        })
  }

  private def unixMicros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  /** Streaming dedup for at-least-once / replayed feeds: duplicate
    * event ids arriving within the watermark horizon collapse to the
    * first arrival, and the dedup state is evicted once the watermark
    * passes — bounded state, unlike a bare dropDuplicates whose state
    * grows forever. The batch-mode equivalent is
    * `dropDuplicates("event_id")`. */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream interval join: every purchase joins the
    * same user's views from the preceding `maxGap` (inclusive of the
    * purchase instant). Both sides carry watermarks and the join
    * predicate is a bounded time range, so each side's buffered state
    * is evicted once the other side's watermark passes — the state
    * stays O(watermark+gap horizon), never the whole stream. Works
    * identically on batch frames (the spec asserts stream == batch). */
  def purchaseAttribution(events: DataFrame, maxGap: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_event_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
      .withWatermark("ts", watermark)
    purchases.join(views,
      col("v_user_id") === col("user_id") &&
        col("view_ts") <= col("ts") &&
        col("view_ts") >= col("ts") - expr(s"INTERVAL $maxGap"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("view_event_id"), col("view_ts"))
  }

  /** Run any of the transforms over a parquet directory as an
    * availableNow file stream into an in-memory sink; returns the sink
    * contents. Used by tests and by batch parity checks. */
  def runAvailableNow(spark: SparkSession, sourceDir: String,
      transform: DataFrame => DataFrame, queryName: String,
      outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val q = transform(stream).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // AvailableNow self-terminates once the initially-available data is
    // processed — await that, do NOT processAllAvailable(): a stateful
    // operator with processing-time TTL/timers keeps scheduling timer
    // batches, so "all available" never drains and the wait never
    // returns (observed with transformWithState + TTLConfig).
    q.awaitTermination()
    spark.table(queryName)
  }
}
