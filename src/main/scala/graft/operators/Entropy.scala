package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shannon entropy of a categorical distribution per group — the
  * label/language-balance audit: entropy near 0 means a group is
  * dominated by one category (a source that collapsed to one
  * language, a split with one label), entropy near ln(n_cats) means
  * uniform.
  *
  * Two partial-aggregating scans and nothing else: count by
  * (group, category), then fold the per-category counts into
  * `ln(n) − Σ c·ln(c) / n` per group — the algebraic form that never
  * materializes probabilities, so the transcendental runs once per
  * DISTINCT (group, category) pair, and both aggregations map-side
  * combine. No windows, no joins; scales in both the group count and
  * the category count. Null categories are a real outcome and count
  * as their own `__NA__` bucket; null groups are dropped. */
object Entropy {
  def distribution(df: DataFrame, groupCol: Column, catCol: Column)
      : DataFrame = {
    val cat = coalesce(catCol.cast("string"), lit("__NA__"))
    val counts = df.where(groupCol.isNotNull)
      .groupBy(groupCol.as("group"), cat.as("__cat"))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col("group"))
      .agg(sum("__c").as("n"),
        count(lit(1)).as("n_cats"),
        sum(col("__c").cast("double") *
          log(col("__c").cast("double"))).as("__clnc"))
      .select(col("group"), col("n"), col("n_cats"),
        (floor((log(col("n").cast("double")) -
          col("__clnc") / col("n").cast("double")) * 1e6 + 0.5) / 1e6)
          .as("entropy"))
  }
}
