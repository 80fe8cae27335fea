package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audit for a release/training corpus: k-anonymity over
  * a quasi-identifier tuple (Sweeney 2002) with the l-diversity
  * refinement (Machanavajjhala et al. 2007) on one sensitive attribute —
  * how many equivalence classes are smaller than k (re-identifiable),
  * how many rows they hold (what a suppression pass would drop), and
  * the worst-case sensitive-value diversity inside any class.
  *
  * Shape at scale: one grouped count+distinct over the quasi columns
  * (map-side combined; the class table is |classes| rows), then a
  * bounded re-aggregate to the one summary row. Integer throughout —
  * the suppressed share is a ppm floor-division of exact longs. */
object Privacy {

  /** Per-class frame: (quasi..., class_size, l_diversity). */
  def classes(df: DataFrame, quasiCols: Seq[String],
              sensitive: Column): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(sensitive).as("l_diversity"))
  }

  /** One-row audit summary at anonymity threshold `k`. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 sensitive: Column, k: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    classes(df, quasiCols, sensitive)
      .agg(count(lit(1)).as("n_classes"),
        sum("class_size").as("n_rows"),
        sum(when(col("class_size") < k, 1L).otherwise(0L))
          .as("classes_below_k"),
        sum(when(col("class_size") < k, col("class_size"))
          .otherwise(0L)).as("rows_below_k"),
        min("class_size").as("min_class_size"),
        min("l_diversity").as("min_l_diversity"))
      .withColumn("suppressed_ppm",
        expr("(rows_below_k * 1000000) div n_rows"))
  }
}
