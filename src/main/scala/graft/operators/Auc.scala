package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact ROC AUC, distributed — the Mann-Whitney identity without a
  * global rank window: AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻)
  * decomposes over DISTINCT scores s as
  * Σ_s pos(s)·(negBelow(s) + ½·neg(s)) / (np·nn), where negBelow is an
  * exclusive prefix count in score order — exactly the [[LanedPrefix]]
  * shape (the `percent_rank` / KS machinery), so "AUC over 10¹¹ scored
  * rows" is one distinct-collapse, one laned prefix, one 1-row
  * reduce — never a one-task ORDER BY rank window.
  *
  * Exactness is integer-side: the ½ clears by doubling —
  * 2·AUC·np·nn = Σ pos(s)·(2·negBelow(s) + neg(s)) is an EXACT long
  * (order-free sum), and AUC is ONE double division at the end,
  * replayable on any engine. Degenerate inputs (no positives or no
  * negatives) return an empty frame rather than 0/0. Output: one row
  * (auc, n_pos, n_neg), auc floor-rounded to 1e-6. */
object Auc {
  def auc(scored: DataFrame, scoreCol: Column, labelCol: Column,
          k: Int = 1024, nLanes: Int = 32): DataFrame = {
    val base = scored.select(scoreCol.cast("double").as("s"),
        labelCol.cast("boolean").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
    val vals = base.groupBy("s")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("y"), 0L).otherwise(1L)).as("neg"))
    // pos rides along so BOTH totals come off the helper's one
    // checkpointed lane-sums pass (its pos_cum is simply unused)
    val (cum, totals) = LanedPrefix.withPrefix(vals, "s",
      Seq("neg", "pos"), k, nLanes, inclusive = false)
    // u2 accumulates in DECIMAL(38,0): pos·(2·negBelow+neg) summed as
    // longs wraps silently (ANSI off) once np·nn nears 2^63 — reachable
    // at ~5e9 rows per class, inside the documented scale — while 38
    // digits hold any u2 a 10^12-row corpus can produce
    cum
      .select((col("pos").cast("decimal(38,0)") *
        (lit(2L) * col("neg_cum") + col("neg")).cast("decimal(38,0)"))
        .as("u2"))
      .agg(sum("u2").as("u2"))
      .crossJoin(broadcast(totals.select(col("neg_tot").as("nn"),
        col("pos_tot").as("np"))))
      .where(col("np") > 0 && col("nn") > 0)
      .select(
        (floor(col("u2").cast("double") /
          (lit(2.0) * col("np").cast("double") *
            col("nn").cast("double")) * 1e6 + 0.5) / 1e6).as("auc"),
        col("np").as("n_pos"), col("nn").as("n_neg"))
  }

  /** Per-group [[auc]] on the grouped laned prefix — "how well does
    * the classifier separate WITHIN each segment" (the Simpson's-
    * paradox check a global AUC hides), same exact-integer identity
    * per group. Null groups are dropped; degenerate groups (no
    * positives or no negatives) are dropped like the global form's
    * degenerate input. Output: (group, auc, n_pos, n_neg), group
    * column named `g`. */
  def aucGrouped(scored: DataFrame, groupCol: Column, scoreCol: Column,
                 labelCol: Column, k: Int = 1024,
                 nLanes: Int = 32): DataFrame = {
    val base = scored.select(groupCol.cast("string").as("g"),
        scoreCol.cast("double").as("s"),
        labelCol.cast("boolean").as("y"))
      .where(col("g").isNotNull && col("s").isNotNull &&
        col("y").isNotNull)
    val vals = base.groupBy("g", "s")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("y"), 0L).otherwise(1L)).as("neg"))
    val (cum, totals) = LanedPrefix.withPrefixGrouped(vals, "g", "s",
      Seq("neg", "pos"), k, nLanes, inclusive = false)
    cum
      .select(col("g"), (col("pos").cast("decimal(38,0)") *
        (lit(2L) * col("neg_cum") + col("neg")).cast("decimal(38,0)"))
        .as("u2"))
      .groupBy("g").agg(sum("u2").as("u2"))
      // totals arrives row-cap-hinted from LanedPrefix (round-13
      // ADVICE on forced per-group broadcasts capping cardinality)
      .join(totals.select(col("g"),
        col("neg_tot").as("nn"), col("pos_tot").as("np")), "g")
      .where(col("np") > 0 && col("nn") > 0)
      .select(col("g"),
        (floor(col("u2").cast("double") /
          (lit(2.0) * col("np").cast("double") *
            col("nn").cast("double")) * 1e6 + 0.5) / 1e6).as("auc"),
        col("np").as("n_pos"), col("nn").as("n_neg"))
  }
}
