package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact two-sample Kolmogorov–Smirnov statistic — the
  * distribution-free companion to [[Analytics.driftPsi]]: PSI needs
  * bucket boundaries chosen up front and reports a bucketed score; KS
  * is `max over v of |F_base(v) − F_current(v)|` over the POOLED value
  * domain — no binning choice, sensitive to any shift — the number a
  * "did this feature drift between snapshots" monitor alarms on.
  *
  * Exact and distributed, never a one-task window: both samples union
  * into one grouped count per distinct value (map-side combined; the
  * per-side counts ride as conditional sums), distinct values lane by
  * equi-depth cuts off a bottom-k sketch
  * ([[Analytics.qsketchRangeBuckets]] — assignment is a pure map, and
  * lanes respect value order, so cross-lane prefixes compose), and the
  * two running counts decompose into a per-lane inclusive window plus
  * an exclusive per-lane-offset prefix (the [[BucketedPrefixSum]]
  * two-level shape, carried for BOTH sides in the same pass). The ECDF
  * difference is then a pure map over distinct values and the statistic
  * one max-aggregate.
  *
  * Replayability: cum/n is one IEEE double division per side, the
  * difference one subtraction — identical on any engine; the single
  * output row rounds the statistic to 1e-6 by the codebase's
  * floor(x·10⁶ + 0.5)/10⁶ convention. Output:
  * (ks_stat, n_base, n_current). Empty sides yield an empty frame
  * rather than a division by zero. */
object KsDrift {
  def ks(base: DataFrame, current: DataFrame, valueCol: String,
         k: Int = 1024, nLanes: Int = 32): DataFrame = {
    val a = base.select(col(valueCol).cast("double").as("v"),
      lit(1L).as("ca"), lit(0L).as("cb"))
    val b = current.select(col(valueCol).cast("double").as("v"),
      lit(0L).as("ca"), lit(1L).as("cb"))
    val vals = a.unionByName(b).where(col("v").isNotNull)
      .groupBy("v").agg(sum("ca").as("ca"), sum("cb").as("cb"))
    val laned = Analytics.qsketchRangeBuckets(vals,
      col("v"), "v", k, nLanes)
    val wIn = Window.partitionBy("bucket").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    // nLanes rows — the only unpartitioned window in the plan
    val wAcross = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤ nLanes rows, materialized so offsets AND totals read the
    // per-lane sums from one pass over the grouped values
    val bucketSums = laned.groupBy("bucket")
      .agg(sum("ca").as("ta"), sum("cb").as("tb"))
      .localCheckpoint()
    val offsets = bucketSums
      .withColumn("offa", coalesce(sum("ta").over(wAcross), lit(0L)))
      .withColumn("offb", coalesce(sum("tb").over(wAcross), lit(0L)))
      .select("bucket", "offa", "offb")
    val totals = bucketSums.agg(sum("ta").as("na"), sum("tb").as("nb"))
    laned
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("cuma", sum("ca").over(wIn) + col("offa"))
      .withColumn("cumb", sum("cb").over(wIn) + col("offb"))
      .crossJoin(broadcast(totals))
      .where(col("na") > 0 && col("nb") > 0)
      .select(abs(col("cuma") / col("na").cast("double") -
        col("cumb") / col("nb").cast("double")).as("d"),
        col("na"), col("nb"))
      .agg((floor(max(col("d")) * 1e6 + 0.5) / 1e6).as("ks_stat"),
        max("na").as("n_base"), max("nb").as("n_current"))
      .where(col("ks_stat").isNotNull)
  }
}
