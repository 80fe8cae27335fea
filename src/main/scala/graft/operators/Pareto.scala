package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) — the "best trade-offs" operator: the rows
  * not dominated on two minimize-dimensions (a row dominates another
  * when it is ≤ on both dims and the pair differs). Multi-objective
  * curation runs on exactly this shape: cheapest-vs-freshest sources,
  * shortest-vs-highest-quality documents, price-vs-size parts.
  *
  * Distributed without a one-task window: the classic sort-scan skyline
  * ("keep a point iff the running min of y over all points before it in
  * (x asc, y asc) order exceeds its y") is exact on DISTINCT pairs, and
  * its global running min decomposes into the two-level lane shape the
  * codebase uses for prefix sums ([[BucketedPrefixSum]]): equi-depth
  * lanes on x off a bottom-k sketch ([[Analytics.qsketchRangeBuckets]]
  * — cut assignment is a pure map over broadcast literals), a per-lane
  * exclusive running min (window bounded by the lane), and an exclusive
  * prefix-min of per-lane minima across lanes (one window over nLanes
  * rows). Lanes cut on x only, so every pair in an earlier lane has
  * strictly smaller x than every pair in a later one (equal x always
  * share a lane) — lane-internal predecessors plus whole earlier lanes
  * are exactly the global (x asc, y asc) predecessors.
  *
  * Correctness of the scan rule on distinct pairs: q = (x, y) is
  * dominated iff some other pair p has p.x ≤ x ∧ p.y ≤ y (distinctness
  * makes one inequality strict for free); any such p sorts strictly
  * before q, and a predecessor with p.y ≤ y exists iff the exclusive
  * running min of y is ≤ y.
  *
  * Scale: the corpus collapses to distinct (x, y) pairs in one map-side
  * combined aggregate before anything ordered happens; the ordered work
  * touches only pairs, laned. Maximize-dimensions negate into this form
  * at the call site. Output: (x, y, n_rows) — the surviving distinct
  * pairs with their corpus multiplicity. */
object Pareto {
  def skyline2D(df: DataFrame, xCol: Column, yCol: Column,
                k: Int = 1024, nLanes: Int = 32): DataFrame = {
    require(nLanes > 0, s"nLanes must be positive, got $nLanes")
    val pairs = df
      .select(xCol.cast("double").as("x"), yCol.cast("double").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy("x", "y").agg(count(lit(1)).as("n_rows"))
    val laned = Analytics.qsketchRangeBuckets(pairs,
      concat_ws("|", col("x"), col("y")), "x", k, nLanes)
    val wIn = Window.partitionBy("bucket").orderBy("x", "y")
      .rowsBetween(Window.unboundedPreceding, -1)
    // nLanes rows total — the only unpartitioned window in the plan
    val wAcross = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    // NOT materialized, deliberately: min is distinct-insensitive, so
    // the optimizer collapses this branch to a column-pruned RAW scan
    // + two-level min (observed in PLANS.md) — one extra cheap scan,
    // but the distinct-pair aggregate runs exactly once, on the main
    // branch. A checkpoint here would force the pairs aggregate twice.
    val offsets = laned.groupBy("bucket").agg(min("y").as("__laneMin"))
      .withColumn("__off", min("__laneMin").over(wAcross))
      .select("bucket", "__off")
    laned
      .withColumn("__runmin", min("y").over(wIn))
      .join(broadcast(offsets), Seq("bucket"))
      // least() skips nulls (first lane / first row have no predecessor)
      .withColumn("__best", least(col("__runmin"), col("__off")))
      .where(col("__best").isNull || col("__best") > col("y"))
      .select("x", "y", "n_rows")
  }
}
