package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming running z-score anomaly detection — Welford's one-pass
  * mean/variance recursion as per-key state, the unbounded-history
  * sibling of the windowed [[graft.operators.Analytics.ewmaAnomaly]]:
  * each event scores against the statistics of EVERYTHING the key has
  * seen before it (never including itself), then folds into them.
  * Three doubles of state per key at any history length.
  *
  * The recursion (delta = x − mean; mean += delta/n; m2 += delta·(x −
  * mean)) is numerically stable where the naive sum-of-squares form
  * cancels catastrophically, and — run in the same order — replays
  * bit-identically: [[anomalyReplay]] folds each key's rows with the
  * SAME float operations, and the CORRECTNESS gate steps the identical
  * recursion as a DuckDB recursive CTE.
  *
  * Same ordering contract as [[StreamingEwma]]: in-batch rows fold in
  * (ts, id) order; cross-batch delivery must respect a key's event
  * order (replayed logs, key-partitioned sources).
  */
object StreamingAnomaly {

  import StreamingEwma.EwmaEvent

  case class AnomalyOut(user_id: Long, event_id: Long, value: Double,
                        z: Option[Double], is_anomaly: Boolean)

  private case class Welford(n: Long, mean: Double, m2: Double)

  /** A row is anomalous when its z-score against the key's PRIOR
    * statistics exceeds `k` in magnitude; keys with fewer than `minN`
    * prior observations (or zero variance) never alarm. */
  private class WelfordState(k: Double, minN: Int)
      extends StatefulProcessor[Long, EwmaEvent, AnomalyOut] {
    @transient private var st: ValueState[Welford] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Welford]("w",
        Encoders.product[Welford], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EwmaEvent],
        timers: TimerValues): Iterator[AnomalyOut] = {
      // full-instant order (getTime is ms-truncated; see StreamingEwma)
      val sorted = rows.toVector
        .sortBy(r => (r.ts.getTime, r.ts.getNanos, r.event_id))
      var w = if (st.exists()) st.get() else Welford(0L, 0.0, 0.0)
      val out = sorted.map { r =>
        val z =
          if (w.n >= minN && w.m2 > 0)
            Some((r.value - w.mean) / math.sqrt(w.m2 / (w.n - 1)))
          else None
        val n1 = w.n + 1
        val delta = r.value - w.mean
        val mean1 = w.mean + delta / n1
        w = Welford(n1, mean1, w.m2 + delta * (r.value - mean1))
        AnomalyOut(r.user_id, r.event_id, r.value,
          z.map(v => math.floor(v * 1e6 + 0.5) / 1e6),
          z.exists(v => math.abs(v) > k))
      }
      st.update(w)
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[AnomalyOut] = Iterator.empty
  }

  /** Streaming form (RocksDB state store required, as for every
    * transformWithState operator in this package). */
  def anomalyStream(events: Dataset[EwmaEvent], k: Double = 3.0,
                    minN: Int = 5,
                    watermark: String = "10 minutes"): Dataset[AnomalyOut] = {
    require(k > 0 && minN >= 2, s"need k > 0, minN >= 2: $k, $minN")
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new WelfordState(k, minN), TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch replay — the oracle twin: per-key sorted fold with the same
    * constants and float order as [[WelfordState]] (same memory contract
    * and caveats as [[StreamingEwma.ewmaReplay]]). */
  def anomalyReplay(events: DataFrame, userCol: String, idCol: String,
                    tsCol: String, valueCol: String, k: Double = 3.0,
                    minN: Int = 5): DataFrame = {
    require(k > 0 && minN >= 2, s"need k > 0, minN >= 2: $k, $minN")
    val kLit = java.lang.Double.toString(k)
    val seq = events
      .select(col(userCol).as("__u"),
        struct(col(tsCol).as("__ts"), col(idCol).as("__eid"),
          col(valueCol).as("__v")).as("__row"))
      .groupBy("__u")
      .agg(array_sort(collect_list(col("__row"))).as("__seq"))
    seq.select(col("__u"), explode(expr(
        s"""aggregate(__seq,
            named_struct('n', cast(0 as bigint), 'mean', 0.0d, 'm2', 0.0d,
              'outs', cast(array() as
                array<struct<eid:bigint,v:double,z:double,a:boolean>>)),
            (acc, x) -> named_struct(
              'n', acc.n + 1,
              'mean', acc.mean + (x.__v - acc.mean) / (acc.n + 1),
              'm2', acc.m2 + (x.__v - acc.mean) *
                (x.__v - (acc.mean + (x.__v - acc.mean) / (acc.n + 1))),
              'outs', concat(acc.outs, array(named_struct(
                'eid', x.__eid, 'v', x.__v,
                'z', CASE WHEN acc.n >= $minN AND acc.m2 > 0 THEN
                  floor((x.__v - acc.mean)
                    / sqrt(acc.m2 / (acc.n - 1)) * 1000000 + 0.5)
                    / 1000000 END,
                'a', CASE WHEN acc.n >= $minN AND acc.m2 > 0 THEN
                  abs((x.__v - acc.mean) / sqrt(acc.m2 / (acc.n - 1)))
                    > $kLit ELSE false END)))),
            acc -> acc.outs)""")).as("__o"))
      .select(col("__u").as(userCol), col("__o.eid").as(idCol),
        col("__o.v").as(valueCol), col("__o.z").as("z"),
        col("__o.a").as("is_anomaly"))
  }
}
