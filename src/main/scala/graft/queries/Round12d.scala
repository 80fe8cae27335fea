package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 fourth batch: time-decayed counts with exact dyadic
  * weights, and a robust (median-slope) trend per series. */
object Round12d {

  /** Exponential decay with a 1-day half-life over integer day
    * buckets, capped at 40 days: weight(d days ago) = 2^(40−d) as a
    * LONG — every weight is an exact power of two, the per-group SUM
    * is exact integer arithmetic (order-free), and one final division
    * by 2^40 yields the decayed count. `pow(0.5, x)` chains or
    * float-decay recurrences would drift per addition order; dyadic
    * longs cannot. */
  private val DecayCapDays = 40
  private val DecayScale = 1L << DecayCapDays

  /** Robust trend: per-series median of lag-3 slopes (a practical
    * Theil-Sen — the median of pairwise slopes over a deterministic
    * pair family instead of all O(n²) pairs). */
  private val TrendLag = 3

  val defs: Map[String, Q] = Map(

    // time-decayed event counts per type ("how active is this stream
    // RIGHT NOW"): the newest day weighs 2^40, each older day half
    // that, >40 days weighs 0 — exact integer sums, one division
    "agg_decayed_counts" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .select(col("event_type"),
          nsToEpochSec(col("ts")).cast("long").as("sec"))
        .where(col("event_type").isNotNull && col("sec").isNotNull)
        .withColumn("day", expr("sec div 86400"))
      val ref = ev.agg(max("day").as("ref_day"))
      ev.crossJoin(broadcast(ref))
        .withColumn("ago", col("ref_day") - col("day"))
        .withColumn("w",
          when(col("ago") <= DecayCapDays,
            expr(s"shiftleft(1L, cast($DecayCapDays - ago AS INT))"))
            .otherwise(lit(0L)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          (sum("w").cast("double") / lit(DecayScale.toDouble))
            .as("decayed_count"))
        .orderBy("event_type")
    }),

    // per-user robust trend: median of lag-3 slopes of the cents
    // series over event order — outlier spikes move the mean slope,
    // not the median. Slopes are exact-integer deltas divided once;
    // the median is the engines' shared exact median
    "window_robust_trend" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("x"))
      val w = Window.partitionBy("user_id").orderBy("event_id")
      ev.withColumn("px", lag("x", TrendLag).over(w))
        .withColumn("pid", lag("event_id", TrendLag).over(w))
        .where(col("px").isNotNull)
        .select(col("user_id"),
          ((col("x") - col("px")).cast("double") /
            (col("event_id") - col("pid")).cast("double")).as("slope"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_slopes"),
          (floor(median(col("slope")) * 1e6 + 0.5) / 1e6)
            .as("med_slope"))
        .orderBy("user_id")
    }))

  val oracles: Map[String, String] = Map(

    "agg_decayed_counts" ->
      s"""WITH ev AS (SELECT event_type,
             epoch_ns(ts) // 1000000000 // 86400 AS day
           FROM events
           WHERE event_type IS NOT NULL AND ts IS NOT NULL),
         ref AS (SELECT max(day) AS ref_day FROM ev),
         wtd AS (SELECT event_type,
             CASE WHEN ref_day - day <= $DecayCapDays
               THEN (1::BIGINT << ($DecayCapDays - (ref_day - day)))
               ELSE 0 END AS w
           FROM ev, ref)
         SELECT event_type, count(*)::BIGINT AS n_events,
           sum(w)::DOUBLE / $DecayScale.0 AS decayed_count
         FROM wtd GROUP BY 1 ORDER BY 1""",

    "window_robust_trend" ->
      s"""WITH ev AS (SELECT user_id, event_id,
             floor(value * 100 + 0.5)::BIGINT AS x
           FROM events
           WHERE user_id IS NOT NULL AND value IS NOT NULL),
         lagged AS (SELECT user_id, event_id, x,
             lag(x, $TrendLag) OVER w AS px,
             lag(event_id, $TrendLag) OVER w AS pid
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
         slopes AS (SELECT user_id,
             (x - px)::DOUBLE / (event_id - pid)::DOUBLE AS slope
           FROM lagged WHERE px IS NOT NULL)
         SELECT user_id, count(*)::BIGINT AS n_slopes,
           floor(median(slope) * 1000000 + 0.5) / 1000000 AS med_slope
         FROM slopes GROUP BY 1 ORDER BY 1""")
}
