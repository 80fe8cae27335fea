package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Jensen–Shannon divergence between two categorical distributions —
  * the symmetric, bounded ([0, ln 2]) companion to the KL recipe audit
  * ([[MixtureKl]]) and the numeric KS drift ([[KsDrift]]): KL explodes
  * when a category exists on one side only, which is exactly what a
  * snapshot diff of `source`/`lang` mixes produces; JSD absorbs it via
  * the midpoint M = (P+Q)/2 and stays finite.
  *
  * Shape: both sides collapse to one grouped count per category in one
  * union scan (map-side combined, the [[KsDrift.ks]] pattern), shares
  * come off a 1-row totals aggregate, and the per-category JSD term
  *   ½·p·ln(p/m) + ½·q·ln(q/m),  m = (p+q)/2,  0·ln(0/·) ≡ 0
  * is a pure map. The output is ONE ROW PER CATEGORY (term rounded at
  * 1e-6) — per the engine's audit convention the float total is NOT
  * summed across rows (cross-partition double addition is
  * order-nondeterministic; the per-category terms are each a single
  * IEEE expression, replayable on any engine, and Σ term = JSD is the
  * consumer's one fold over a category-sized frame).
  *
  * Output: (category, n_base, n_current, p, q, js_term), categories
  * observed on either side; null categories are dropped. */
object JsDivergence {
  def audit(base: DataFrame, current: DataFrame,
            categoryCol: Column): DataFrame = {
    val a = base.select(categoryCol.cast("string").as("category"),
      lit(1L).as("ca"), lit(0L).as("cb"))
    val b = current.select(categoryCol.cast("string").as("category"),
      lit(0L).as("ca"), lit(1L).as("cb"))
    val counts = Checkpoints.pin(a.unionByName(b)
      .where(col("category").isNotNull)
      .groupBy("category")
      .agg(sum("ca").as("n_base"), sum("cb").as("n_current")))
    // |categories| rows; pinned so totals + terms don't re-aggregate
    val tot = counts.agg(sum("n_base").as("__na"),
      sum("n_current").as("__nb"))
    val p = col("n_base").cast("double") / col("__na").cast("double")
    val q = col("n_current").cast("double") / col("__nb").cast("double")
    val m = (p + q) / 2.0
    def halfTerm(x: Column): Column =
      when(x > 0.0, x * log(x / m) * 0.5).otherwise(lit(0.0))
    counts.crossJoin(broadcast(tot))
      .where(col("__na") > 0 && col("__nb") > 0)
      .select(col("category"), col("n_base"), col("n_current"),
        p.as("p"), q.as("q"),
        (floor((halfTerm(p) + halfTerm(q)) * 1e6 + 0.5) / 1e6)
          .as("js_term"))
  }
}
