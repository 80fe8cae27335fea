package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact Gini coefficient, distributed — the concentration number
  * behind "does one supplier take most of the spend", "are token
  * counts hoarded by a few documents": G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) −
  * (n+1)/n over the sorted individual values.
  *
  * The rank sum needs every value's position in the GLOBAL sort — the
  * classic one-task trap — but it collapses over distinct values: a
  * tie block of count c whose predecessors number p₀ contributes
  * x·(c·p₀ + c(c+1)/2) regardless of within-tie order, and p₀ is
  * exactly the [[LanedPrefix]] exclusive count. One distinct-collapse,
  * one laned prefix, one 1-row reduce.
  *
  * Values are LONGS by contract (scale currency to cents first): the
  * block terms and both totals accumulate in DECIMAL(38,0), so the
  * statistic is exact integer arithmetic closed by two double
  * divisions mirrored by the oracle. Negative values violate Gini's
  * definition and fail loudly. Output: one row (gini, n, total);
  * empty/zero-total input yields an empty frame. */
object Gini {
  def gini(df: DataFrame, valueCol: Column,
           k: Int = 1024, nLanes: Int = 32): DataFrame = {
    val vals = df.select(valueCol.cast("long").as("v"))
      .where(col("v").isNotNull)
      .where(assert_true(col("v") >= 0,
        lit("Gini needs non-negative values")).isNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
    val (cum, totals) = LanedPrefix.withPrefix(vals, "v",
      Seq("c"), k, nLanes, inclusive = false)
    val vD = col("v").cast("decimal(38,0)")
    val cD = col("c").cast("decimal(38,0)")
    val p0 = col("c_cum").cast("decimal(38,0)")
    // 2·Σ x·(c·p₀ + c(c+1)/2) = 2·Σ x·c·p₀ + Σ x·c·(c+1): the halving
    // folds into the final doubling, so everything stays integral —
    // no decimal division anywhere
    val s = cum
      .select((vD * cD * p0).as("ta"),
        (vD * cD * (cD + 1)).as("tb"),
        (vD * cD).as("vc"))
      .agg(sum("ta").as("SA"), sum("tb").as("SB"), sum("vc").as("T"))
    s.crossJoin(broadcast(totals.select(col("c_tot").as("n"))))
      .where(col("n") > 0 && col("T") > 0)
      .select(
        (floor(((col("SA") * 2 + col("SB")).cast("double") /
          (col("n").cast("double") * col("T").cast("double")) -
          (col("n") + 1).cast("double") / col("n").cast("double"))
          * 1e6 + 0.5) / 1e6).as("gini"),
        col("n"), col("T").cast("long").as("total"))
  }

  /** Exact Lorenz-curve points — the report the Gini summarizes into
    * one number: at each p = d/points, the share of total value held
    * by the bottom ⌈p·n⌉ individuals. The bottom-r prefix is exact
    * off the SAME laned machinery: r lands inside one distinct-value
    * tie block (p₀ < r ≤ p₀ + c), whose members are interchangeable,
    * so share·T = Σ_{v'<v} v'·c' + v·(r − p₀) — integer arithmetic
    * (the value-weighted prefix runs in DECIMAL(38,0)), one division
    * at the edge. Target ranks are exact integers: r = ⌈d·n/points⌉
    * computed as (d·n + points − 1) div points, never a float.
    *
    * The targets frame is `points` rows; matching each target to its
    * spanning tie block is a broadcast nested-loop over the DISTINCT
    * values — one scan whatever the corpus size. Output:
    * (p, r, cum_share) with cum_share floor-rounded to 1e-6; empty /
    * zero-total input yields an empty frame. */
  def lorenz(df: DataFrame, valueCol: Column, points: Int = 10,
             k: Int = 1024, nLanes: Int = 32): DataFrame = {
    require(points >= 1, s"points must be >= 1, got $points")
    val vals = df.select(valueCol.cast("long").as("v"))
      .where(col("v").isNotNull)
      .where(assert_true(col("v") >= 0,
        lit("Lorenz needs non-negative values")).isNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
      .withColumn("vc", (col("v") * col("c")).cast("decimal(38,0)"))
    val (cum, totals) = LanedPrefix.withPrefix(vals, "v",
      Seq("c", "vc"), k, nLanes, inclusive = false)
    val spark = df.sparkSession
    val targets = spark.range(1, points + 1).select(col("id").as("d"))
      .crossJoin(broadcast(totals.select(col("c_tot").as("n"),
        col("vc_tot").as("T"))))
      .where(col("n") > 0 && col("T") > 0)
      .select(col("d"), col("n"), col("T"),
        expr(s"(d * n + ${points - 1}) div $points").as("r"))
    cum.join(broadcast(targets),
        col("c_cum") < col("r") && col("r") <= col("c_cum") + col("c"))
      .select(
        (col("d").cast("double") / points).as("p"),
        col("r"),
        (floor((col("vc_cum") +
          col("v").cast("decimal(38,0)") * (col("r") - col("c_cum")))
          .cast("double") / col("T").cast("double") * 1e6 + 0.5) / 1e6)
          .as("cum_share"))
      .orderBy("p")
  }

  /** Per-group [[gini]] on the grouped laned prefix — "spend
    * concentration per segment" in the same exact-integer arithmetic,
    * one row per group. Null groups are dropped (no meaningful
    * segment); groups with zero total are dropped like the global
    * form's empty input. Output: (group, gini, n, total), group column
    * named `g`. */
  def giniGrouped(df: DataFrame, groupCol: Column, valueCol: Column,
                  k: Int = 1024, nLanes: Int = 32): DataFrame = {
    val vals = df.select(groupCol.cast("string").as("g"),
        valueCol.cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .where(assert_true(col("v") >= 0,
        lit("Gini needs non-negative values")).isNull)
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val (cum, totals) = LanedPrefix.withPrefixGrouped(vals, "g", "v",
      Seq("c"), k, nLanes, inclusive = false)
    val vD = col("v").cast("decimal(38,0)")
    val cD = col("c").cast("decimal(38,0)")
    val p0 = col("c_cum").cast("decimal(38,0)")
    cum
      .select(col("g"), (vD * cD * p0).as("ta"),
        (vD * cD * (cD + 1)).as("tb"), (vD * cD).as("vc"))
      .groupBy("g")
      .agg(sum("ta").as("SA"), sum("tb").as("SB"), sum("vc").as("T"))
      // totals arrives row-cap-hinted from LanedPrefix (round-13
      // ADVICE on forced per-group broadcasts capping cardinality)
      .join(totals.select(col("g"), col("c_tot").as("n")), "g")
      .where(col("n") > 0 && col("T") > 0)
      .select(col("g"),
        (floor(((col("SA") * 2 + col("SB")).cast("double") /
          (col("n").cast("double") * col("T").cast("double")) -
          (col("n") + 1).cast("double") / col("n").cast("double"))
          * 1e6 + 0.5) / 1e6).as("gini"),
        col("n"), col("T").cast("long").as("total"))
  }
}
