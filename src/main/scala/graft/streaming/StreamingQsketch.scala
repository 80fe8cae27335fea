package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.operators.Analytics

/** Streaming bottom-k-by-hash quantile sketch — the unbounded-feed
  * sibling of [[Analytics.qsketchSample]]. Each shard (the stream's
  * group key — a hash lane, NOT a semantic group) folds events into a
  * ≤ k-row bottom-k-by-(h, v) buffer: k·16 bytes of state per shard,
  * forever, whatever the stream length. Because every row's hash is
  * global, the union of shard sketches re-sketches EXACTLY to the
  * corpus sketch ([[Analytics.qsketchMerge]]'s contract), so "p99 of
  * everything seen so far" is a shards·k-row read-off at any moment —
  * the streaming quantile answer with zero approximation beyond the
  * sample itself.
  *
  * Emission contract: after each micro-batch a shard emits its CURRENT
  * sketch tagged with `n_seen` (cumulative events folded), so the
  * latest emission per shard — max `n_seen` — IS the sketch; readers
  * take that frontier and merge. The batch twin
  * [[qsketchReplayShards]] computes the identical per-shard end state
  * in one pass (the custom bounded-buffer top-k operator), which the
  * CORRECTNESS gate replays in DuckDB.
  */
object StreamingQsketch {

  case class QsEvent(shard: Int, h: Long, v: Double)
  case class QsOut(shard: Int, n_seen: Long, h: Long, v: Double)

  /** Fixed-size state: the shard's bottom-k rows + fold count. */
  case class Sketch(n: Long, hs: Array[Long], vs: Array[Double])

  private class SketchState(k: Int)
      extends StatefulProcessor[Int, QsEvent, QsOut] {
    @transient private var state: ValueState[Sketch] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Sketch]("sk",
        Encoders.product[Sketch], TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[QsEvent],
        timers: TimerValues): Iterator[QsOut] = {
      val prev = if (state.exists()) state.get()
        else Sketch(0L, Array.empty, Array.empty)
      var n = prev.n
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
      prev.hs.indices.foreach(i => buf += ((prev.hs(i), prev.vs(i))))
      rows.foreach { r => buf += ((r.h, r.v)); n += 1 }
      // bottom-k by (h, v): identical rule to qsketchSample's
      // orderBy("h", "v").limit(k)
      val kept = buf.sortBy(identity).take(k)
      state.update(Sketch(n, kept.map(_._1).toArray,
        kept.map(_._2).toArray))
      kept.iterator.map { case (h, v) => QsOut(key, n, h, v) }
    }

    override def handleExpiredTimer(key: Int, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[QsOut] = Iterator.empty
  }

  /** Streaming form: per micro-batch, each touched shard re-emits its
    * updated ≤ k-row sketch stamped with the cumulative fold count.
    * Requires the RocksDB state store (`transformWithState`). */
  def qsketchStream(events: Dataset[QsEvent], k: Int): Dataset[QsOut] = {
    require(k > 1, s"k must exceed 1, got $k")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.shard)
      .transformWithState(new SketchState(k), TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch replay of the per-shard end state — the oracle twin: the
    * bottom-k-by-(h, v) of each shard's rows in ONE bounded-buffer
    * pass ([[Analytics.topKPerGroupExec]]; h negated because the
    * operator keeps the k largest). Output: (shard, h, v). */
  def qsketchReplayShards(df: DataFrame, shardCol: Column, rowKey: Column,
                          valueCol: String, k: Int): DataFrame = {
    require(k > 1, s"k must exceed 1, got $k")
    val hashed = df.select(shardCol.cast("int").as("shard"),
        conv(substring(md5(rowKey.cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"),
        col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && col("h").isNotNull)
      .withColumn("negh", -col("h"))
    Analytics.topKPerGroupExec(hashed, Seq("shard"), "negh", k,
        Seq("v"))
      .select(col("shard"), col("h"), col("v"))
  }

  /** Shard sketches → corpus quantiles: exact merge (keep the k
    * globally smallest hashes) then the deterministic lower-index
    * read-off — `shards·k` rows in, `|probs|` rows out. */
  def mergedQuantiles(shardSketches: DataFrame, k: Int,
                      probs: Seq[(String, Double)]): DataFrame =
    Analytics.qsketchQuantiles(
      Analytics.qsketchMerge(Seq(shardSketches.select("h", "v")), k),
      probs)
}
