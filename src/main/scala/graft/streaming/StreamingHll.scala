package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.functions.Md5Prefix
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming distinct-count — the unbounded-feed sibling of the
  * `agg_hll_grouped` batch gate: per key, the state is ONE bounded
  * HyperLogLog register array (2^P ints) in the md5-replayable family
  * the batch sketch uses, so the stream answers "distinct users per
  * event type so far" in O(2^P) memory per key forever.
  *
  * Register max-merge is commutative, associative and idempotent, so
  * the state is order-free, micro-batch-split-invariant, and MERGEABLE
  * across lanes/snapshots by per-bucket max — and the merged estimate
  * is BIT-IDENTICAL to the batch sketch over the same feed (same
  * integer ρ arithmetic, same exact-integer Z accumulation, one
  * trailing float division). The emission contract mirrors
  * [[StreamingDecay]]: each micro-batch a touched key re-emits its
  * state stamped with the cumulative event count; latest emission per
  * key (max n) IS the state. */
object StreamingHll {

  /** Register-index bits: 2^P = 1024 buckets per key. */
  val P = 10
  val WBits: Int = 60 - P
  private val Mask = (1L << WBits) - 1

  case class HEvent(key: String, hash: Long)
  case class HState(key: String, regs: Seq[Int], n: Long)

  /** The 60-bit md5 hash as a Column — the SAME family as
    * [[graft.operators.Analytics.hllRegisters]], so any engine (and
    * the DuckDB oracle) replays it. */
  def hashCol(item: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Md5Prefix(item.cast("string"), 15)

  def bucketOf(hash: Long): Int = (hash >>> WBits).toInt

  /** ρ = (wBits + 1) − bitlength(w), with the all-zero word mapping to
    * wBits + 1 — integer arithmetic only. */
  def rhoOf(hash: Long): Int = {
    val w = hash & Mask
    if (w == 0L) WBits + 1
    else WBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }

  private def zeroRegs: Seq[Int] = Seq.fill(1 << P)(0)

  private[graft] def fold(s: HState, hash: Long): HState = {
    val regs = if (s.n == 0L) zeroRegs else s.regs
    val b = bucketOf(hash)
    val r = rhoOf(hash)
    val next = if (regs(b) >= r) regs else regs.updated(b, r)
    HState(s.key, next, s.n + 1)
  }

  private class HllProcessor
      extends StatefulProcessor[String, HEvent, HState] {
    @transient private var state: ValueState[HState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[HState]("hll",
        Encoders.product[HState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[HEvent],
        timers: TimerValues): Iterator[HState] = {
      val prev = if (state.exists()) state.get()
        else HState(key, zeroRegs, 0L)
      val next = rows.foldLeft(prev)((s, r) => fold(s, r.hash))
      state.update(next)
      Iterator.single(next)
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[HState] = Iterator.empty
  }

  /** Streaming form: per micro-batch each touched key re-emits its
    * bounded register state. Requires the RocksDB state store. */
  def hllStream(events: Dataset[HEvent]): Dataset[HState] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new HllProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch computation of the per-key END state — identical to what
    * the streaming fold reaches after the same feed (register max is
    * order-free), computed in one aggregation-shaped pass: per
    * (key, bucket) max ρ pivoted into the bounded array. */
  def endStates(df: DataFrame, keyCol: String, itemCol: String)
      : DataFrame = {
    val hash = hashCol(col(itemCol))
    val w = hash.bitwiseAND(lit(Mask))
    val rho = when(w === 0, lit(WBits + 1))
      .otherwise(lit(WBits + 1) - length(bin(w)))
    df.where(col(keyCol).isNotNull && col(itemCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        shiftright(hash, WBits).as("__b"), rho.cast("int").as("__rho"))
      .groupBy("key", "__b")
      .agg(max("__rho").as("__m"), count(lit(1)).as("__c"))
      .groupBy("key")
      .agg(sum("__c").as("n"),
        map_from_entries(collect_list(struct(col("__b"), col("__m"))))
          .as("__map"))
      .withColumn("regs", expr(
        s"transform(sequence(0, ${(1 << P) - 1}), i -> " +
          "coalesce(element_at(__map, cast(i AS BIGINT)), 0))"))
      .select("key", "regs", "n")
  }

  /** Merge per-key/per-lane states by per-bucket max and estimate:
    * (key, n_events, hll_est) — the same alpha·m²/Z formula, Z in
    * exact integer arithmetic, as the batch sketch. */
  def merged(states: DataFrame): DataFrame = {
    val registers = states
      .select(col("key"), col("n"),
        posexplode(col("regs")).as(Seq("__b", "__rho")))
      .groupBy("key", "__b")
      .agg(max("__rho").as("m_reg"))
      .where(col("m_reg") > 0)
    val ns = states.groupBy("key").agg(sum("n").as("n_events"))
    graft.operators.Analytics.hllEstimateGrouped(
        registers, Seq("key"), P)
      .join(ns, "key")
      .select(col("key"), col("n_events"), col("hll_est"))
  }
}
