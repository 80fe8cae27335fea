package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time windowing over the events stream (SURVEY.md §2.8 extension).
  *
  * The same aggregations run in batch (for the correctness oracle) and as
  * Structured Streaming with a watermark (the scale path: incremental
  * state, late-data eviction). The events table stores nanosecond epochs
  * (read as BIGINT under the nanos-as-long mapping); they convert to
  * microsecond timestamps for Spark's window functions.
  */
object EventWindows {

  /** Exact integral floor-division for epoch arithmetic: plain `/` is
    * double division, which loses ulps at 1e18-scale nanoseconds (an
    * exact multiple of d whose long->double conversion rounds down would
    * come out floor-1). SQL `div` is exact truncating long division; the
    * correction turns truncation into floor for negative epochs. */
  def nsDiv(ns: Column, d: Long): Column = {
    val q = org.apache.spark.sql.graft.Shim.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.Shim.expression(ns),
        org.apache.spark.sql.graft.Shim.expression(lit(d))))
    q - when(q * d > ns, lit(1L)).otherwise(lit(0L))
  }

  /** BIGINT nanoseconds -> TimestampType (microsecond precision). */
  def nsToTs(ns: Column): Column = timestamp_micros(nsDiv(ns, 1000L))

  /** Normalize an events frame's `ts` to the BIGINT-nanoseconds domain
    * every graft operator computes in. Testdata drops have carried the
    * column as TIMESTAMP(NANOS) (read as BIGINT ns under
    * `nanosAsLong`) and, since the round-10 regeneration, as
    * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ): accept both — and the
    * TZ-typed variant — and return ns. The conversion is exact integer
    * µs→ns arithmetic (the cast NTZ→TIMESTAMP is instant-preserving
    * under the UTC session timezone all graft entry points set). */
  def tsToNs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }

  def epochSec(ts: Column): Column = unix_timestamp(ts)

  /** Tumbling windows: one row per (window, event_type). */
  def tumbling(events: DataFrame, every: String): DataFrame =
    events.withColumn("__ts", nsToTs(col("ts")))
      .groupBy(window(col("__ts"), every).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(epochSec(col("w.start")).as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding windows (size/slide): each event lands in size/slide windows. */
  def sliding(events: DataFrame, size: String, slide: String): DataFrame =
    events.withColumn("__ts", nsToTs(col("ts")))
      .groupBy(window(col("__ts"), size, slide).as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(epochSec(col("w.start")).as("window_start"), col("n"),
        col("sum_value"))

  /** Session windows per user: events closer than `gap` merge. */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events.withColumn("__ts", nsToTs(col("ts")))
      .groupBy(session_window(col("__ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), epochSec(col("w.start")).as("session_start"),
        col("n"), col("sum_value"))

  /** Stream-stream interval join with watermarks on both sides: right
    * rows within `[left.time - within, left.time]` per key. The
    * watermarks bound the join state — each side buffers only rows newer
    * than (watermark - within), so state is O(rate x window) at any
    * corpus size. Column names must be pre-disambiguated by the caller
    * (required for self-joins of one source).
    */
  def streamingIntervalJoin(left: DataFrame, right: DataFrame,
                            leftKey: String, rightKey: String,
                            leftTime: String, rightTime: String,
                            watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $within") &&
        col(rightTime) <= col(leftTime))
  }

  /** The events schema as stored (ts as parquet TIMESTAMP(MICROS),
    * surfacing as TIMESTAMP_NTZ; [[tsToNs]] maps it to BIGINT ns). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming variant of [[tumbling]] with a watermark: reads a directory
    * of event parquet files as an unbounded source; state for a window is
    * dropped once the watermark passes its end (bounded state at any
    * scale). `eventsDir` must be a directory (file-stream source contract).
    */
  def streamingTumbling(spark: SparkSession, eventsDir: String, every: String,
                        watermark: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tsToNs(spark.readStream.schema(eventsSchema).parquet(eventsDir))
      .withColumn("__ts", nsToTs(col("ts")))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), every).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(epochSec(col("w.start")).as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Streaming twin of [[sliding]]: watermarked sliding windows over any
    * streaming source (state per open window, dropped past the
    * watermark). Column contract matches the batch form exactly, so the
    * batch query is the oracle.
    */
  def streamingSliding(events: DataFrame, size: String, slide: String,
                       watermark: String): DataFrame =
    events.withColumn("__ts", nsToTs(col("ts")))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), size, slide).as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(epochSec(col("w.start")).as("window_start"), col("n"),
        col("sum_value"))

  /** Hourly resample with forward fill per event_type: the time-series
    * gap-filling shape (metrics dashboards, feature backfill). Missing
    * hours in each type's [min, max] span appear with the LAST observed
    * hourly average carried forward and `n_events = 0`.
    *
    * Scale shape: the corpus collapses in the FIRST aggregation
    * (map-side partial avg/count per (type, hour) — the shuffle carries
    * types × hours rows, never events). Everything after — span, grid
    * explode, left join, the forward-fill window — runs on that bounded
    * cardinality, so a 100 TB event log costs one aggregating scan. The
    * hourly average is rounded BEFORE filling so carried values replay
    * bit-identically in a SQL oracle.
    */
  def resampleHourlyFfill(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("__hour")
      .rowsBetween(Long.MinValue, 0)
    val hourly = events
      .withColumn("__hour", nsDiv(col("ts"), 3600L * 1000000000L))
      .groupBy(col("event_type"), col("__hour"))
      // arithmetic half-up rounding (floor(x*100+.5)/100): engine-stable
      // where round() diverges on exact .005 averages (and 10.675 occurs
      // in the test events), same convention as TextAnalysis.round4
      .agg((floor(avg("value") * 100 + 0.5) / 100).as("__avg"),
        count(lit(1)).as("__n"))
    val grid = hourly.groupBy("event_type")
      .agg(min("__hour").as("__lo"), max("__hour").as("__hi"))
      .select(col("event_type"),
        explode(sequence(col("__lo"), col("__hi"))).as("__hour"))
    grid.join(hourly, Seq("event_type", "__hour"), "left")
      .select(col("event_type"), (col("__hour") * 3600L).as("hour_start"),
        last(col("__avg"), ignoreNulls = true).over(w).as("avg_filled"),
        coalesce(col("__n"), lit(0L)).as("n_events"))
  }

  /** Streaming twin of [[sessions]]: watermarked `session_window` — gaps
    * merge incrementally in the state store; a session emits once the
    * watermark passes its close. Column contract matches the batch form.
    */
  def streamingSessions(events: DataFrame, gap: String,
                        watermark: String): DataFrame =
    events.withColumn("__ts", nsToTs(col("ts")))
      .withWatermark("__ts", watermark)
      .groupBy(session_window(col("__ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), epochSec(col("w.start")).as("session_start"),
        col("n"), col("sum_value"))
}
