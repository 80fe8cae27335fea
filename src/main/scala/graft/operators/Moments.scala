package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped higher-moment statistics — population skewness and excess
  * kurtosis per key, the distribution-shape audit next to mean/stddev
  * (a value column that suddenly skews or grows tails is drifting even
  * when its mean is flat).
  *
  * One map-side-combined aggregation collects the raw power sums
  * (n, Σx, Σx², Σx³, Σx⁴); the central moments come out of the
  * standard algebraic identities per GROUP row, so the whole operator
  * is a single shuffle of 5 numbers per key at any corpus size:
  *
  *   m2 = S2/n − μ²,   m3 = S3/n − 3μ·S2/n + 2μ³,
  *   m4 = S4/n − 4μ·S3/n + 6μ²·S2/n − 3μ⁴
  *   skew = m3/m2^1.5,  kurt_excess = m4/m2² − 3
  *
  * Degenerate groups (m2 ≤ 0: constant or single-row) report 0 for
  * both shapes — never-NaN discipline. Doubles round at 1e-4 at the
  * edge (power sums are reduce-order-sensitive in the last ulps, the
  * same trade as the corr/regression gates). */
object Moments {
  def shape(df: DataFrame, keyCol: Column, valueCol: Column): DataFrame = {
    val x = valueCol.cast("double")
    val agg = df.where(keyCol.isNotNull && x.isNotNull)
      .groupBy(keyCol.as("key"))
      .agg(count(lit(1)).as("n"), sum(x).as("__s1"),
        sum(x * x).as("__s2"), sum(x * x * x).as("__s3"),
        sum(x * x * x * x).as("__s4"))
    val nD = col("n").cast("double")
    val mu = col("__s1") / nD
    val m2 = col("__s2") / nD - mu * mu
    val m3 = col("__s3") / nD - lit(3.0) * mu * (col("__s2") / nD) +
      lit(2.0) * mu * mu * mu
    val m4 = col("__s4") / nD - lit(4.0) * mu * (col("__s3") / nD) +
      lit(6.0) * mu * mu * (col("__s2") / nD) -
      lit(3.0) * mu * mu * mu * mu
    def r4(c: Column): Column = floor(c * 1e4 + 0.5) / 1e4
    agg.select(col("key"), col("n"), r4(mu).as("mean"),
      when(m2 > 0.0, r4(m3 / pow(m2, 1.5))).otherwise(lit(0.0))
        .as("skewness"),
      when(m2 > 0.0, r4(m4 / (m2 * m2) - lit(3.0))).otherwise(lit(0.0))
        .as("kurtosis_excess"))
  }
}
