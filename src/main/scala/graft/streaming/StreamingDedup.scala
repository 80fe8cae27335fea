package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming exact deduplication — the streaming twin of
  * `graft.dedup.Dedup.exactGroups`.
  *
  * `dropDuplicates` on an unbounded stream retains every key ever seen —
  * state grows without bound. `dropDuplicatesWithinWatermark` bounds the
  * state to the watermark horizon: a key is remembered until the
  * watermark passes its event time + delay, then evicted, so state is
  * O(rate x horizon) at any corpus size. The documented trade: a
  * duplicate arriving after its key's eviction is emitted again — the
  * standard contract for at-most-once-per-horizon dedup of a firehose
  * (training-data ingest, event logs).
  */
object StreamingDedup {

  /** @param events  streaming DataFrame with an event-time column
    * @param tsCol   event-time (TimestampType) column the watermark rides
    * @param delay   watermark delay, e.g. "10 minutes" — also the dedup
    *                horizon: duplicates within it are suppressed
    * @param keyCols dedup key columns (e.g. a content digest)
    */
  def exact(events: DataFrame, tsCol: String, delay: String,
            keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** One exploded MinHash band row of a document. */
  case class BandRow(id: Long, ts: java.sql.Timestamp, band: Int, bucket: Long)

  /** A successful bucket claim (the claiming doc and its event time). */
  case class Claim(id: Long, ts: java.sql.Timestamp)

  /** First-wins bucket claim store for [[nearDupKeep]], keyed on
    * (band, bucket). Each batch is resolved DETERMINISTICALLY — min
    * (event time, id) wins the bucket — unlike
    * `dropDuplicatesWithinWatermark`, which keeps an arbitrary row per
    * key within a batch. An event-time timer evicts the claim once the
    * watermark passes its event time + delay, so state stays
    * O(buckets-per-horizon).
    */
  private class BucketClaim(delayMs: Long)
      extends StatefulProcessor[(Int, Long), BandRow, Claim] {
    @transient private var owner: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandRow],
        timers: TimerValues): Iterator[Claim] =
      if (owner.exists()) Iterator.empty // bucket already owned this horizon
      else {
        val w = rows.minBy(r => (r.ts.getTime, r.id))
        owner.update(w.id)
        getHandle.registerTimer(w.ts.getTime + delayMs)
        Iterator.single(Claim(w.id, w.ts))
      }

    override def handleExpiredTimer(key: (Int, Long), timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[Claim] = {
      owner.clear()
      Iterator.empty
    }
  }

  /** Streaming NEAR-dup keep-decision — the streaming twin of the
    * one-pass `Dedup.minhashRepresentatives` trade: first-wins instead
    * of min-id-wins, no transitive closure, bounded state.
    *
    * Shape: each document explodes to its MinHash band buckets; the
    * [[BucketClaim]] store keyed on (band, bucket) lets the FIRST
    * document to arrive claim each bucket (claims evict with the
    * watermark, like [[exact]]); a tumbling-window count per document
    * then keeps exactly the documents whose claims ALL succeeded — any
    * lost claim means an earlier near-duplicate already owns one of its
    * buckets.
    *
    * The claim store is `transformWithState` rather than
    * `dropDuplicatesWithinWatermark`: within one micro-batch the latter
    * keeps an ARBITRARY row per key, so two near-duplicates landing in
    * the same batch could split their shared buckets — each losing some
    * claim — and BOTH be dropped. [[BucketClaim]] resolves every batch
    * deterministically (min (event-time, id) wins), so the earliest
    * document wins ALL of its buckets and same-batch near-dups lose
    * exactly like cross-batch ones. `transformWithState`'s
    * eventTimeColumnName contract propagates the watermark through the
    * operator, which is what licenses the downstream windowed
    * aggregation (two chained stateful operators in append mode); all
    * of a document's band rows share its single event time, so a
    * document never straddles the aggregation window.
    *
    * Emits (window, id, ts) of KEPT documents when the window closes.
    * State: O(buckets-per-horizon) for the claim store (an event-time
    * timer drops each claim once the watermark passes its event time +
    * delay) + one count per in-flight document — both watermark-bounded
    * at any corpus rate.
    *
    * Requires a LongType (or castable) id column, and — a
    * `transformWithState` engine requirement — the RocksDB state store
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`),
    * which is also the provider you'd run at 100 TB scale anyway: claim
    * state lives off-heap with incremental checkpointing instead of on
    * the executor heap.
    */
  def nearDupKeep(docs: DataFrame, tsCol: String, delay: String,
                  windowDuration: String, idCol: String, textCol: String,
                  numHashes: Int = 64, bands: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.dedup.Dedup
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(iv.months == 0, "calendar-month watermark delays unsupported")
    val delayMs = iv.days * 86400000L + iv.microseconds / 1000L
    val banded = docs
      .withColumn("__sig",
        Dedup.minhashSignature(Dedup.wordSet(col(textCol)), numHashes))
      .withColumn("__bands", Dedup.bandHashes(col("__sig"), bands, rows))
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        posexplode(col("__bands")).as(Seq("band", "bucket")))
      .withWatermark("ts", delay)
      .as[BandRow]
    val claimed = banded
      .groupByKey(r => (r.band, r.bucket))
      .transformWithState(new BucketClaim(delayMs), "ts", OutputMode.Append())
    claimed
      .groupBy(window(col("ts"), windowDuration), col("id"))
      .agg(count(lit(1)).as("__claims"), min("ts").as("ts"))
      .filter(col("__claims") === bands)
      .select(col("window"), col("id").as(idCol), col("ts"))
  }

  /** Deterministic BATCH replay of [[nearDupKeep]]'s claim decision —
    * the oracle-checkable twin: over a banded signature table
    * (id, ts, band, bucket), each bucket's owner is its min (ts, id)
    * row (exactly the [[BucketClaim]] rule with no horizon eviction,
    * i.e. every document inside one watermark horizon), and a document
    * is kept iff it owns ALL of its band buckets.
    *
    * Shapes exactly like [[graft.dedup.Dedup.minhashRepresentatives]]:
    * one partial-aggregating groupBy per bucket (the min struct
    * combines map-side) + one join back + one groupBy per doc — no
    * unpartitioned window, no pair materialization. `ts` can be any
    * orderable type (timestamp in streaming, epoch long in audits).
    */
  def nearDupKeepReplay(banded: DataFrame, bands: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val owner = banded.groupBy("band", "bucket")
      .agg(min(struct(col("ts"), col("id"))).as("__w"))
    banded.join(owner, Seq("band", "bucket"))
      .groupBy("id")
      .agg(sum(when(col("__w.id") === col("id"), 1).otherwise(0)).as("__won"),
        min("ts").as("ts"))
      .filter(col("__won") === bands)
      .select("id", "ts")
  }
}
