package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming exponentially-weighted moving average — the O(1)-state
  * per-key recursion s ← α·x + (1−α)·s that the batch
  * [[graft.operators.Analytics.ewma]] truncates a window around.
  *
  * The recursion is the form that actually fits a stream: one double of
  * state per key, updated per event, whatever the history length — the
  * metric-smoothing / anomaly-baseline primitive for an unbounded event
  * feed. The batch twin [[ewmaReplay]] computes the identical sequential
  * fold per key (same float-operation ORDER, so results are
  * bit-identical on an in-order feed), and is what the CORRECTNESS gate
  * replays in DuckDB as a recursive CTE.
  *
  * Ordering contract: within a micro-batch, each key's rows fold in
  * (ts, id) order; across batches the stream must deliver a key's rows
  * in event-time order (true for replayed logs and any source
  * partitioned by key) — a late row folds when it arrives, exactly as
  * a monitoring EWMA would absorb it.
  */
object StreamingEwma {

  case class EwmaEvent(user_id: Long, event_id: Long,
                       ts: java.sql.Timestamp, value: Double)
  case class EwmaOut(user_id: Long, event_id: Long, value: Double,
                     ewma: Double)

  /** Per-key last-smoothed-value store; the first event of a key seeds
    * s = x (pandas `adjust=false`). */
  private class EwmaState(alpha: Double)
      extends StatefulProcessor[Long, EwmaEvent, EwmaOut] {
    private val oneMinus = 1.0 - alpha
    @transient private var last: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Double]("s", Encoders.scalaDouble,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EwmaEvent],
        timers: TimerValues): Iterator[EwmaOut] = {
      // full-instant order: getTime alone is millisecond-truncated and
      // would fold same-millisecond events in event_id order even when
      // their microsecond order disagrees, diverging from the replay
      // twin (which sorts by the micro-precision timestamp)
      val sorted = rows.toVector
        .sortBy(r => (r.ts.getTime, r.ts.getNanos, r.event_id))
      var s: Option[Double] =
        if (last.exists()) Some(last.get()) else None
      val out = sorted.map { r =>
        val next = s match {
          case Some(prev) => alpha * r.value + oneMinus * prev
          case None => r.value
        }
        s = Some(next)
        EwmaOut(r.user_id, r.event_id, r.value, next)
      }
      s.foreach(last.update)
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[EwmaOut] = Iterator.empty
  }

  /** Streaming form: one smoothed output row per input event. Requires
    * the RocksDB state store (the `transformWithState` engine
    * contract — and the provider you would run at scale anyway). */
  def ewmaStream(events: Dataset[EwmaEvent], alpha: Double,
                 watermark: String = "10 minutes"): Dataset[EwmaOut] = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new EwmaState(alpha), TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch replay of the recursion — the oracle twin. Each key's rows
    * sort once inside their own collect_list (per-key lists, never a
    * global window) and fold left with the SAME constants and float
    * order as [[EwmaState]]. The collected list bounds memory at one
    * key's history — right for gate-scale verification; production
    * smoothing of unbounded histories is exactly what the streaming
    * form exists for. */
  def ewmaReplay(events: DataFrame, userCol: String, idCol: String,
                 tsCol: String, valueCol: String,
                 alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    val a = java.lang.Double.toString(alpha)
    val om = java.lang.Double.toString(1.0 - alpha)
    val seq = events
      .select(col(userCol).as("__u"),
        struct(col(tsCol).as("__ts"), col(idCol).as("__eid"),
          col(valueCol).as("__v")).as("__row"))
      .groupBy("__u")
      .agg(array_sort(collect_list(col("__row"))).as("__seq"))
    seq.select(col("__u"), explode(expr(
        s"""aggregate(__seq,
            cast(array() as array<struct<eid:bigint,v:double,s:double>>),
            (acc, x) -> concat(acc, array(named_struct(
              'eid', x.__eid, 'v', x.__v,
              's', CASE WHEN size(acc) = 0 THEN x.__v
                ELSE $a * x.__v + $om * element_at(acc, -1).s END))))"""))
        .as("__o"))
      .select(col("__u").as(userCol), col("__o.eid").as(idCol),
        col("__o.v").as(valueCol),
        // arithmetic 6-dp rounding: floor(x*1e6+0.5)/1e6 is the same
        // IEEE ops on any engine, where round() ties differ (Spark
        // rounds the shortest decimal repr, DuckDB the binary double)
        (floor(col("__o.s") * 1e6 + 0.5) / 1e6).as("ewma_rec"))
  }
}
