package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming importance selection — the unbounded-feed sibling of the
  * `sample_importance` batch gate: keep the best k documents by the
  * DSIR Gumbel key ([[graft.operators.Dsir.withGumbelKey]]) over a
  * stream, in bounded memory, forever. The state is one k-row buffer
  * per HASH SHARD (ids lane by `id % shards`, so no shard ever holds
  * more than k rows and ingest parallelism scales with the shard
  * count); the global answer is the top-k of the ≤ shards·k kept rows.
  *
  * Per-shard top-k is a max-semilattice: order-free,
  * micro-batch-split-invariant, idempotent under at-least-once
  * re-delivery (the kept buffer is a SET of (key, id) pairs — a
  * re-delivered doc folds onto itself), and two-level top-k equals
  * global top-k exactly. The batch replay ([[replayShards]]) runs on
  * the bounded-buffer TopKPerGroup physical operator — never a
  * per-shard sort — and [[merged]] reads the global answer off the
  * shards·k rows with one TakeOrderedAndProject. */
object StreamingImportance {

  case class IEvent(shard: Int, id: Long, isTarget: Boolean,
                    nTokens: Long, logwPpm: Long, keyPpm: Long)
  /** Kept rows SORTED by (keyPpm DESC, id ASC) — canonical, so states
    * compare byte-for-byte across arrival orders. */
  case class IState(shard: Int, n: Long, ids: Seq[Long],
                    targets: Seq[Boolean], toks: Seq[Long],
                    logws: Seq[Long], keys: Seq[Long])

  private[graft] def fold(s: IState, e: IEvent, k: Int): IState = {
    val rows = s.ids.indices.map(i =>
      (s.keys(i), s.ids(i), s.targets(i), s.toks(i), s.logws(i)))
    val kept = (rows :+ ((e.keyPpm, e.id, e.isTarget, e.nTokens,
      e.logwPpm))).distinct
      .sortBy(t => (-t._1, t._2)).take(k)
    IState(s.shard, s.n + 1, kept.map(_._2), kept.map(_._3),
      kept.map(_._4), kept.map(_._5), kept.map(_._1))
  }

  private class TopKProcessor(k: Int)
      extends StatefulProcessor[Int, IEvent, IState] {
    @transient private var state: ValueState[IState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[IState]("topk",
        Encoders.product[IState], TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[IEvent],
        timers: TimerValues): Iterator[IState] = {
      val prev = if (state.exists()) state.get()
        else IState(shard, 0L, Nil, Nil, Nil, Nil, Nil)
      val next = rows.foldLeft(prev)((s, e) => fold(s, e, k))
      state.update(next)
      Iterator.single(next)
    }

    override def handleExpiredTimer(shard: Int, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[IState] = Iterator.empty
  }

  /** Streaming form: each micro-batch a touched shard re-emits its
    * bounded state; latest emission per shard (max n) IS the state.
    * Requires the RocksDB state store (`transformWithState`). */
  def topKStream(events: Dataset[IEvent], k: Int): Dataset[IState] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.shard)
      .transformWithState(new TopKProcessor(k), TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch per-shard END state rows — identical kept set to the
    * streaming fold's (top-k is order-free), computed on the
    * bounded-buffer top-k operator. Input: a Gumbel-keyed weights
    * frame (id, is_target, n_tokens, logw_ppm, key_ppm). Output one
    * row per kept doc: (shard, id, is_target, n_tokens, logw_ppm,
    * key_ppm). */
  def replayShards(keyed: DataFrame, shardOf: Column, shards: Int,
                   k: Int): DataFrame = {
    require(shards > 0 && k > 0, s"shards/k positive: $shards/$k")
    val sharded = keyed.withColumn("shard", shardOf.cast("int"))
    graft.operators.Analytics.topKPerGroupExec(sharded, Seq("shard"),
        "key_ppm", k, Seq("id"))
      .select("shard", "id", "is_target", "n_tokens", "logw_ppm",
        "key_ppm")
  }

  /** Shard states → the global top-k: one bounded TakeOrderedAndProject
    * over the ≤ shards·k kept rows. Two-level top-k is exact — every
    * global winner wins its shard. */
  def merged(shardRows: DataFrame, k: Int): DataFrame =
    shardRows.select("id", "is_target", "n_tokens", "logw_ppm", "key_ppm")
      .orderBy(col("key_ppm").desc, col("id"))
      .limit(k)
}
