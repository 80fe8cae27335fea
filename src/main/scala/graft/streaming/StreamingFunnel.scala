package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, ValueState}

/** Streaming ordered-funnel tracker — the streaming twin of
  * `graft.operators.Analytics.funnel`.
  *
  * Per user, a [[ValueState]] holds (steps completed, event time of the
  * counted event for the last completed step). Each micro-batch's rows
  * sort by (event time, step) inside the handler — so within-batch
  * arrival order never matters — and the tracker advances greedily:
  * the next expected step counts iff its event time STRICTLY follows
  * the previous counted step's, exactly the batch operator's
  * greedy-earliest rule. One `StepDone(user, step_idx, ts)` row emits
  * per advance, at most `|steps|` rows per user ever.
  *
  * Equivalence contract (pinned in the spec): fed per-user
  * event-time-ordered batches, the emitted step counts equal
  * `Analytics.funnel` on the same data. Cross-batch REGRESSIONS in
  * event time still produce a valid greedy funnel under arrival order,
  * but may count a later step-k event than the batch oracle would —
  * the standard streaming-funnel trade, stated rather than hidden.
  *
  * State: one (int, long) per user in the horizon. Pass `ttl` to evict
  * idle users' progress (processing-time TTL) — at firehose scale the
  * tracker then holds active users only, not every user ever seen.
  */
object StreamingFunnel {

  /** One funnel-relevant event: step = index into the step list. */
  case class FunnelEv(user: Long, step: Int, ts: java.sql.Timestamp)

  /** A step completion: emitted once per (user, step_idx). */
  case class StepDone(user: Long, step_idx: Int, ts: java.sql.Timestamp)

  private class Tracker(numSteps: Int, ttl: Option[java.time.Duration])
      extends StatefulProcessor[Long, FunnelEv, StepDone] {
    @transient private var prog: ValueState[(Int, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      prog = getHandle.getValueState[(Int, Long)]("prog",
        Encoders.product[(Int, Long)],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    override def handleInputRows(user: Long, rows: Iterator[FunnelEv],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[StepDone] = {
      var (done, lastTs) =
        if (prog.exists()) prog.get() else (0, Long.MinValue)
      val out = scala.collection.mutable.ListBuffer.empty[StepDone]
      // deterministic within-batch order: event time, then step index
      rows.toSeq.sortBy(r => (r.ts.getTime, r.step)).foreach { r =>
        if (done < numSteps && r.step == done &&
          (done == 0 || r.ts.getTime > lastTs)) {
          done += 1
          lastTs = r.ts.getTime
          out += StepDone(user, done, r.ts)
        }
      }
      prog.update((done, lastTs))
      out.iterator
    }
  }

  /** @param events  streaming DataFrame with `tsCol` (TimestampType)
    * @param delay   watermark delay the event-time column rides
    * @param steps   ordered step types (e.g. view, click, purchase)
    * @param ttl     optional processing-time TTL for idle users' state */
  def funnelProgress(events: DataFrame, tsCol: String, delay: String,
                     userCol: String, typeCol: String, steps: Seq[String],
                     ttl: Option[java.time.Duration] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (e, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(e)
      }
    events
      .withColumn("__step", stepIdx)
      .filter(col("__step") >= 0)
      .select(col(userCol).cast("long").as("user"),
        col("__step").as("step"), col(tsCol).as("ts"))
      .withWatermark("ts", delay)
      .as[FunnelEv]
      .groupByKey(_.user)
      .transformWithState(new Tracker(steps.length, ttl), "ts",
        OutputMode.Append())
      .toDF()
  }
}
