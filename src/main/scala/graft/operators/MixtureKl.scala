package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-mixture divergence audit — "how far is the current source
  * mix from the recipe": per source, the actual share p, the target
  * weight q, and the KL contribution p·ln(p/q); Σ of the terms is
  * KL(actual ‖ target), the number a data-mixing run alarms on before
  * a retrain. The target recipe travels as a broadcast two-column
  * table built from the caller's constant map — sources OUTSIDE the
  * recipe surface with a null `target_w`/`kl_term` row (an unplanned
  * source is exactly what the audit exists to catch) rather than
  * failing or silently renormalizing.
  *
  * One grouped count, one 1-row total, one broadcast join: the
  * distributed cost is a map-side-combined count per source whatever
  * the corpus size. Shares are single IEEE divisions; the only
  * transcendental (ln) rounds at the edge by the 1e-6 floor
  * convention. Output: (source, n, share, target_w, kl_term) — one
  * row per observed source. */
object MixtureKl {
  def audit(df: DataFrame, sourceCol: Column,
            target: Map[String, Double]): DataFrame = {
    require(target.nonEmpty, "target recipe must be non-empty")
    require(target.values.forall(_ > 0),
      "target weights must be positive (q = 0 makes KL infinite)")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(sourceCol.cast("string").as("source"))
      .where(col("source").isNotNull)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .transform(d => Checkpoints.pin(d)) // |sources| rows; totals + terms share one pass (durable when the session has a checkpoint dir)
    val tot = counts.agg(sum("n").as("__tot"))
    val recipe = target.toSeq.sortBy(_._1).toDF("source", "target_w")
    counts
      .join(broadcast(recipe), Seq("source"), "left")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n"),
        (col("n").cast("double") / col("__tot").cast("double"))
          .as("share"),
        col("target_w"),
        (floor((col("n").cast("double") / col("__tot").cast("double")) *
          log((col("n").cast("double") / col("__tot").cast("double")) /
            col("target_w")) * 1e6 + 0.5) / 1e6).as("kl_term"))
  }
}
