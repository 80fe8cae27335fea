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

  /** Batch twin of [[funnelProgress]] under event-time-ordered replay:
    * the per-user `StepDone` rows the tracker emits when fed the whole
    * history in event-time order. Step 1 counts at the user's earliest
    * step-1 event; step k at the earliest step-k event STRICTLY after
    * the counted step-(k−1) time — the same greedy-earliest rule, so
    * the equivalence is provable row-by-row (pinned in
    * `StreamingFunnelSpec`) and replayable as a chained-CTE SQL oracle.
    *
    * Scale shape: one equi-join + map-side-combined min-aggregate per
    * step, each shuffling on the user key only; the per-step frames
    * shrink monotonically (funnel survivors), and no per-user event
    * collection ever happens. Output: (`userCol`, step_idx, ts).
    */
  def progressReplay(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, steps: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      // rename before the join: both sides descend from `events`, and a
      // same-name predicate would collapse to one attribute (trivially
      // true) — the self-join lineage trap
      events.filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
        .join(prev, col("__u") === col(userCol) && col("__ts") > col("__t"))
        .groupBy(col(userCol)).agg(min(col("__ts")).as("__t"))
    }
    reached.zipWithIndex.map { case (stage, i) =>
      stage.select(col(userCol), lit(i + 1).cast("int").as("step_idx"),
        col("__t").as("ts"))
    }.reduce(_.unionAll(_))
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
