package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming time-decayed counts — the unbounded-feed sibling of the
  * `agg_decayed_counts` batch gate: per key, a BOUNDED state of
  * `CapDays + 1` per-age-day event counts plus the reference day and
  * the total count. Decay under an advancing reference is an array
  * rotation (ages grow, beyond-cap buckets drop), and the decayed
  * value is read out as Σ count[age]·2^(CapDays − age) — evaluated in
  * DECIMAL(38,0) at read time, so no weight arithmetic ever lives in
  * the state and nothing can overflow there.
  *
  * Why counts-per-age and not one pre-weighted scalar: a scalar sum of
  * dyadic weights is NOT exactly decayable by a right shift — two
  * events of weight 2^0 sum to 2^1, and a 1-day shift turns that into
  * 2^0 where the true answer is 0 + 0 = 0 (the carry across terms
  * survives the shift). Per-age counts have no carries: any arrival
  * order, any micro-batch split, and any lane merge reach the same
  * state (counts commute), which is what lets the batch twin compute
  * the end state order-free and the oracle replay it.
  *
  * Emission contract mirrors [[StreamingTopK]]: after each micro-batch
  * a touched key re-emits its state stamped with the cumulative event
  * count; the latest emission per key (max `n`) IS the state. Merging
  * lanes (or snapshots) aligns each state to the newest reference day
  * and adds counts — the summary is mergeable like the engine's other
  * sketches. */
object StreamingDecay {

  /** Decay horizon: weight 2^(CapDays − age) for ages 0..CapDays,
    * 0 beyond. */
  val CapDays = 40
  val Scale: Long = 1L << CapDays

  case class DcEvent(key: String, day: Long)
  case class DcState(key: String, ref_day: Long, counts: Seq[Long],
                     n: Long)

  private def zeroCounts: Seq[Long] = Seq.fill(CapDays + 1)(0L)

  /** One event folded into a state (arrival order; any order ends the
    * same — counts commute). */
  private[graft] def fold(s: DcState, day: Long): DcState = {
    var ref = s.ref_day
    var counts = s.counts
    if (s.n == 0L) {
      ref = day
      counts = zeroCounts
    } else if (day > ref) {
      val shift = math.min(day - ref, (CapDays + 1).toLong).toInt
      counts = (Seq.fill(shift)(0L) ++ counts).take(CapDays + 1)
      ref = day
    }
    val age = ref - day
    if (age <= CapDays)
      counts = counts.updated(age.toInt, counts(age.toInt) + 1L)
    DcState(s.key, ref, counts, s.n + 1)
  }

  private class DecayProcessor
      extends StatefulProcessor[String, DcEvent, DcState] {
    @transient private var state: ValueState[DcState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DcState]("dc",
        Encoders.product[DcState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DcEvent],
        timers: TimerValues): Iterator[DcState] = {
      val prev = if (state.exists()) state.get()
        else DcState(key, 0L, zeroCounts, 0L)
      val next = rows.foldLeft(prev)((s, r) => fold(s, r.day))
      state.update(next)
      Iterator.single(next)
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[DcState] = Iterator.empty
  }

  /** Streaming form: per micro-batch each touched key re-emits its
    * bounded state. Requires the RocksDB state store. */
  def decayStream(events: Dataset[DcEvent]): Dataset[DcState] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new DecayProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch computation of the per-key END state — identical to what
    * the streaming fold reaches after the same feed, computed
    * order-free in two aggregation-shaped passes: per-key reference
    * day, then per-(key, age) counts pivoted into the bounded array
    * (ages beyond the cap count toward `n` only, like the fold). */
  def endStates(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val ev = df.select(col(keyCol).cast("string").as("key"),
        col(dayCol).cast("long").as("day"))
      .where(col("key").isNotNull && col("day").isNotNull)
    val refs = ev.groupBy("key").agg(max("day").as("ref_day"))
    ev.join(refs, "key") // AQE broadcasts when |keys| is small
      .withColumn("__age",
        least(col("ref_day") - col("day"), lit((CapDays + 1).toLong))
          .cast("int"))
      .groupBy("key", "ref_day", "__age")
      .agg(count(lit(1)).as("__cnt"))
      .groupBy("key", "ref_day")
      .agg(sum("__cnt").as("n"),
        map_from_entries(collect_list(struct(col("__age"), col("__cnt"))))
          .as("__m"))
      .withColumn("counts", expr(
        s"transform(sequence(0, $CapDays), i -> " +
          "coalesce(element_at(__m, i), 0L))"))
      .select("key", "ref_day", "counts", "n")
  }

  /** Merge per-key/per-lane states into the global decayed count per
    * key at the GLOBAL newest day: rotate every state's counts by its
    * distance to the global reference (ages grow, beyond-cap buckets
    * drop — counts, so no carry artifacts), add, and read the value
    * out in DECIMAL(38,0). Output:
    * (key, n_events, decayed_count = Σ count·2^(CapDays−age) / 2^CapDays). */
  def merged(states: DataFrame): DataFrame = {
    val gref = states.agg(max("ref_day").as("__gref"))
    states.crossJoin(broadcast(gref))
      .withColumn("__shift", col("__gref") - col("ref_day"))
      .withColumn("__dec", expr(
        s"""aggregate(sequence(0, $CapDays),
             cast(0 AS DECIMAL(38,0)),
             (acc, i) -> acc + IF(i >= __shift,
               cast(coalesce(
                 element_at(counts, cast(i - __shift AS INT) + 1), 0L)
                 AS DECIMAL(38,0)) *
               cast(shiftleft(1L, $CapDays - i) AS DECIMAL(38,0)),
               cast(0 AS DECIMAL(38,0))))"""))
      .groupBy("key")
      .agg(sum("n").as("n_events"),
        (sum("__dec").cast("double") / lit(Scale.toDouble))
          .as("decayed_count"))
  }
}
