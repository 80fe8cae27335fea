package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Holt's linear (double-exponential) smoothing per key — the
  * level+trend forecaster one step up from EWMA:
  *
  *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},  l_1 = x_1, b_1 = 0
  *
  * The recurrence is inherently sequential in t, but the SERIES is the
  * per-(key, period) aggregate, not the raw feed — so the fold runs
  * over a bounded array per key (|periods| elements) via one
  * `aggregate()` HOF after a map-side-combined count, and the raw-data
  * pass stays embarrassingly parallel. α, β are exact binary doubles
  * (0.5, 0.25) and the inputs are exact integer counts, so the fold is
  * the same IEEE op sequence on any engine — the DuckDB oracle replays
  * it with `list_reduce` and matches bit-for-bit.
  *
  * State is [l, b, n] (n=0 sentinel = uninitialized, so the zero
  * accumulator never contaminates l_1). Output per key:
  * (key, n_periods, level, trend, forecast = level + trend), doubles
  * floor-rounded at 1e-6. */
object Holt {
  val Alpha = 0.5
  val Beta = 0.25

  def linear(df: DataFrame, keyCol: Column, tCol: Column): DataFrame = {
    val daily = df.where(keyCol.isNotNull && tCol.isNotNull)
      .groupBy(keyCol.as("key"), tCol.as("t"))
      .agg(count(lit(1)).cast("double").as("x"))
    val folded = daily.groupBy("key")
      .agg(count(lit(1)).as("n_periods"),
        expr(
          s"""aggregate(
               transform(array_sort(collect_list(struct(t, x))),
                 s -> s.x),
               array(cast(0.0 AS DOUBLE), cast(0.0 AS DOUBLE),
                 cast(0.0 AS DOUBLE)),
               (acc, x) -> IF(acc[2] = 0.0,
                 array(x, cast(0.0 AS DOUBLE), cast(1.0 AS DOUBLE)),
                 array($Alpha * x + ${1 - Alpha} * (acc[0] + acc[1]),
                   $Beta * (($Alpha * x + ${1 - Alpha} *
                     (acc[0] + acc[1])) - acc[0]) +
                     ${1 - Beta} * acc[1],
                   acc[2] + 1.0)))""").as("__st"))
    folded.select(col("key"), col("n_periods"),
      (floor(col("__st")(0) * 1e6 + 0.5) / 1e6).as("level"),
      (floor(col("__st")(1) * 1e6 + 0.5) / 1e6).as("trend"),
      (floor((col("__st")(0) + col("__st")(1)) * 1e6 + 0.5) / 1e6)
        .as("forecast"))
  }
}
