package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state API for semantics `session_window` can't express
  * (here: sessions that also close after a max event count, and report
  * their first/last event types).
  *
  * State per user is O(1): a single [[SessionAgg]] of running aggregates
  * (never the raw events), so a 1000-executor deployment holds
  * |active users| × a few fields. Idle users are evicted by an
  * EVENT-TIME timeout: when the watermark passes the open session's
  * end + gap, the session flushes with `closed_by = "timeout"` and the
  * state is removed — without it, open sessions of users who never
  * return would pin state forever. Event-time (not processing-time)
  * eviction keeps the operator deterministic under replay and
  * backfill, and the watermark already exists for late-data bounds.
  *
  * Ordering contract of the streaming form: events are sorted within
  * each micro-batch; across batches they must be non-decreasing in time
  * per user (enforce upstream with a watermark + window sort if the
  * source can reorder). This is the standard trade for O(1) state — the
  * alternative (buffering raw events to re-sort) is unbounded.
  */
object SessionState {

  case class Event(user_id: Long, ts_ns: Long, event_type: String, value: Double)

  case class SessionAgg(user_id: Long, start_ns: Long, var end_ns: Long,
                        var n: Long, var sum_value: Double,
                        first_type: String, var last_type: String)

  case class SessionOut(user_id: Long, session_start_sec: Long, n: Long,
                        sum_value: Double, first_type: String,
                        last_type: String, closed_by: String)

  private def toOut(s: SessionAgg, why: String): SessionOut =
    SessionOut(s.user_id, s.start_ns / 1000000000L, s.n, s.sum_value,
      s.first_type, s.last_type, why)

  /** Core fold shared by the batch and streaming forms: advance an
    * optional open session over time-sorted events; emit closed sessions,
    * return the still-open tail aggregate. A session closes on a gap
    * >= gapNs or when maxEvents is reached.
    */
  private def foldSorted(initial: Option[SessionAgg], sorted: Seq[Event],
                         gapNs: Long, maxEvents: Int)
      : (Seq[SessionOut], Option[SessionAgg]) = {
    val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
    var cur = initial
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_ns - s.end_ns < gapNs && s.n < maxEvents =>
          s.end_ns = e.ts_ns; s.n += 1; s.sum_value += e.value
          s.last_type = e.event_type
        case Some(s) =>
          // a time gap is the primary closure cause; the event cap only
          // reports when the next event arrived inside the gap window
          out += toOut(s, if (e.ts_ns - s.end_ns >= gapNs) "gap" else "max_events")
          cur = Some(SessionAgg(e.user_id, e.ts_ns, e.ts_ns, 1L, e.value,
            e.event_type, e.event_type))
        case None =>
          cur = Some(SessionAgg(e.user_id, e.ts_ns, e.ts_ns, 1L, e.value,
            e.event_type, e.event_type))
      }
    }
    (out.toSeq, cur)
  }

  /** Batch/stream-agnostic session logic: events sorted by time per user;
    * the trailing open session closes with reason "end".
    */
  def sessionize(events: Iterator[Event], gapNs: Long,
                 maxEvents: Int): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_ns, e.event_type))
    val (closed, open) = foldSorted(None, sorted, gapNs, maxEvents)
    (closed ++ open.map(toOut(_, "end"))).iterator
  }

  /** Batch form: one shuffle on user_id, then per-group sessionization. */
  def batchSessions(spark: SparkSession, events: Dataset[Event],
                    gapNs: Long, maxEvents: Int): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups((_, it) => sessionize(it, gapNs, maxEvents))
  }

  /** [[Event]] plus the derived timestamp column carrying the watermark. */
  case class TsEvent(user_id: Long, ts_ns: Long, event_type: String,
                     value: Double, __ts: java.sql.Timestamp)

  /** Streaming form: state per user is the open session's [[SessionAgg]]
    * only. Closed sessions emit incrementally as gaps/caps appear; once
    * the watermark passes an open session's `end + gap`, the session is
    * flushed (`closed_by = "timeout"`) and its state removed — so idle
    * users never pin state.
    */
  def streamingSessions(spark: SparkSession, events: Dataset[Event],
                        gapNs: Long, maxEvents: Int,
                        watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withColumn("__ts", EventWindows.nsToTs(col("ts_ns")))
      .withWatermark("__ts", watermarkDelay)
      .as[TsEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, incoming: Iterator[TsEvent], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val flushed = state.getOption.map(toOut(_, "timeout"))
            state.remove()
            flushed.iterator
          } else {
            val sorted = incoming
              .map(e => Event(e.user_id, e.ts_ns, e.event_type, e.value))
              .toSeq.sortBy(e => (e.ts_ns, e.event_type))
            val (closed, open) =
              foldSorted(state.getOption, sorted, gapNs, maxEvents)
            open match {
              case Some(s) =>
                state.update(s)
                // ceiling ns->ms so the timeout never fires BEFORE the
                // true end+gap instant (truncation could flush up to 2ms
                // early and split a session the batch form merges); must
                // also be strictly beyond the current watermark
                val fireAtMs = (s.end_ns + gapNs + 999999L) / 1000000L
                state.setTimeoutTimestamp(math.max(
                  fireAtMs, state.getCurrentWatermarkMs + 1000L))
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }

  /** Adapter from the stored events table (ts as BIGINT nanoseconds). */
  def fromEventsTable(spark: SparkSession, df: org.apache.spark.sql.DataFrame): Dataset[Event] = {
    import spark.implicits._
    df.select(col("user_id"), col("ts").as("ts_ns"), col("event_type"),
      col("value")).as[Event]
  }
}
