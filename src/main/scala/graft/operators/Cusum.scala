package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM changepoint detection on per-key count series — the classic
  * "did the level shift" monitor (Page 1954) over event volumes: the
  * standardized cumulative deviation from the series mean,
  * `cusum_t = (S_t − t·μ)/σ`, drifts toward ±max exactly at a level
  * shift, and the argmax |cusum| is the canonical changepoint
  * estimate.
  *
  * Determinism by construction: every floating-point input is derived
  * from EXACT integers — `S_t` (running count sum), `t` (rank), and
  * the per-key moments (n, Σc, Σc²) are longs, so μ and σ and every
  * cusum value are the same IEEE doubles on any engine; no
  * order-dependent double summation anywhere. The aggregation is
  * map-side combined; the only windows run per key over the
  * POST-AGGREGATION series (|periods| rows per key, never raw
  * events), and the per-key moment table joins back on the key.
  * A constant series (σ = 0) scores cusum 0 — never-NaN discipline. */
object Cusum {

  /** (key, t, c, cusum) — the standardized count-CUSUM series per key,
    * `cusum` floor-rounded at 1e-6. */
  def series(df: DataFrame, keyCol: Column, tCol: Column): DataFrame = {
    val daily = df.where(keyCol.isNotNull && tCol.isNotNull)
      .groupBy(keyCol.as("key"), tCol.as("t"))
      .agg(count(lit(1)).as("c"))
    val stats = daily.groupBy("key").agg(
      count(lit(1)).as("__n"), sum("c").as("__s"),
      sum(col("c") * col("c")).as("__s2"))
    val wSum = Window.partitionBy("key").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wRank = Window.partitionBy("key").orderBy("t")
    val mu = col("__s").cast("double") / col("__n").cast("double")
    val sigma = sqrt((col("__s2").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") /
        col("__n").cast("double")) / col("__n").cast("double"))
    daily
      .withColumn("__St", sum("c").over(wSum))
      .withColumn("__i", row_number().over(wRank).cast("long"))
      .join(stats, "key")
      .select(col("key"), col("t"), col("c"),
        when(sigma > 0.0,
          floor((col("__St").cast("double") -
            col("__i").cast("double") * mu) / sigma * 1e6 + 0.5) / 1e6)
          .otherwise(lit(0.0)).as("cusum"))
  }

  /** One row per key: the changepoint candidate — argmax |cusum|
    * (earliest t on exact ties): (key, n_periods, cp_t, cp_cusum). */
  def changepoint(df: DataFrame, keyCol: Column, tCol: Column)
      : DataFrame = {
    val ser = series(df, keyCol, tCol)
    val wBest = Window.partitionBy("key")
      .orderBy(abs(col("cusum")).desc, col("t").asc)
    ser
      .withColumn("__r", row_number().over(wBest))
      .withColumn("__np", count(lit(1))
        .over(Window.partitionBy("key")))
      .where(col("__r") === 1)
      .select(col("key"), col("__np").as("n_periods"),
        col("t").as("cp_t"), col("cusum").as("cp_cusum"))
  }
}
