package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-mixture sampling plan — the arithmetic every training-data
  * pipeline runs before the sampling stage: given target mixture
  * weights per source and a total token budget, how many tokens each
  * source must contribute and the implied EPOCH count over that
  * source (> 1 = the source repeats, the up-sampling regime; < 1 =
  * subsample). The planning twin of the executing samplers
  * ([[graft.pipeline.Curation]] mixture/cap stages): those take rates,
  * this derives them.
  *
  * Shape: one map-side-combined grouped count over the corpus (docs +
  * tokens per source, the [[TokenBudget]] whitespace convention) joined
  * to the broadcast literal weight table. Sources in the corpus with no
  * target weight plan to zero (they are dropped by the mix); weights
  * naming absent sources are surfaced with zero availability so the
  * caller SEES the impossible ask instead of silently renormalizing
  * around it. All divisions happen once per SOURCE row, 1e-6-rounded —
  * never a data-sized float accumulation. */
object MixPlan {

  def plan(df: DataFrame, sourceCol: Column, textCol: Column,
           weights: Seq[(String, Double)], budgetTokens: Long): DataFrame = {
    require(weights.nonEmpty, "at least one target weight")
    require(weights.forall(_._2 > 0), s"weights must be positive: $weights")
    // a duplicate source would duplicate that source's output rows via
    // the full_outer join AND silently skew wSum for every other source
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate sources in weights: ${weights.map(_._1)}")
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    val spark = df.sparkSession
    val wSum = weights.map(_._2).sum
    val nTok = when(textCol.isNotNull && length(trim(textCol)) > 0,
      size(split(trim(textCol), "\\s+")).cast("long")).otherwise(0L)
    val avail = df.where(sourceCol.isNotNull)
      .groupBy(sourceCol.cast("string").as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(nTok).as("n_tokens"))
    import spark.implicits._
    val wdf = weights.toDF("source", "__w")
    avail.join(broadcast(wdf), Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (floor(coalesce(col("__w"), lit(0.0)) / wSum * 1e6 + 0.5) / 1e6)
          .as("weight"),
        floor(lit(budgetTokens.toDouble) *
          coalesce(col("__w"), lit(0.0)) / wSum).cast("long")
          .as("target_tokens"))
      .withColumn("epochs",
        when(col("n_tokens") > 0L,
          floor(col("target_tokens").cast("double") /
            col("n_tokens").cast("double") * 1e6 + 0.5) / 1e6))
      .orderBy("source")
  }
}
