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

  /** Streaming NEAR-dup keep-decision — the streaming twin of the
    * one-pass `Dedup.minhashRepresentatives` trade: first-wins instead
    * of min-id-wins, no transitive closure, bounded state.
    *
    * Shape: each document explodes to its MinHash band buckets;
    * `dropDuplicatesWithinWatermark` on (band, bucket) lets the FIRST
    * document to arrive claim each bucket (bucket state evicts with the
    * watermark, like [[exact]]); a tumbling-window count per document
    * then keeps exactly the documents whose claims ALL succeeded — any
    * lost claim means an earlier near-duplicate already owns one of its
    * buckets. Two chained stateful operators in append mode (dedup →
    * windowed aggregation), which Structured Streaming supports since
    * the multi-stateful-operator work; all of a document's band rows
    * share its single event time, so a document never straddles the
    * aggregation window.
    *
    * Emits (window, id, ts) of KEPT documents when the window closes.
    * State: O(buckets-per-horizon) for the claim store + one count per
    * in-flight document — both watermark-bounded at any corpus rate.
    */
  def nearDupKeep(docs: DataFrame, tsCol: String, delay: String,
                  windowDuration: String, idCol: String, textCol: String,
                  numHashes: Int = 64, bands: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.dedup.Dedup
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val banded = docs
      .withColumn("__sig",
        Dedup.minhashSignature(Dedup.wordSet(col(textCol)), numHashes))
      .withColumn("__bands", Dedup.bandHashes(col("__sig"), bands, rows))
      .select(col(idCol), col(tsCol),
        posexplode(col("__bands")).as(Seq("band", "bucket")))
      .withWatermark(tsCol, delay)
    banded
      .dropDuplicatesWithinWatermark(Seq("band", "bucket"))
      .groupBy(window(col(tsCol), windowDuration), col(idCol))
      .agg(count(lit(1)).as("__claims"), min(tsCol).as("ts"))
      .filter(col("__claims") === bands)
      .select(col("window"), col(idCol), col("ts"))
  }
}
