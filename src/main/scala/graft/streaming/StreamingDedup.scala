package graft.streaming

import org.apache.spark.sql.DataFrame

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
}
