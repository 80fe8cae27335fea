package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Md5Prefix

/** Poisson bootstrap — THE scalable bootstrap (Chamandy et al.,
  * "Estimating Uncertainty for Massive Data Streams", Google 2012):
  * instead of resampling n rows with replacement (which needs global
  * coordination), each row enters replicate b with multiplicity
  * ~ Poisson(1), decided independently per (row, b). Every replicate
  * is then a single map-side-combined aggregation — one scan computes
  * all B replicate statistics, no shuffle wider than B rows.
  *
  * Determinism: the multiplicity is the inverse-CDF count of 60-bit
  * md5 integers against PRECOMPUTED integer thresholds
  * (⌊CDF_Poisson(1)(k)·2^60⌋, k = 0..6, capped at 7 — P(X>7) ≈ 1e-5),
  * so any engine replays the exact resample; the statistic here is a
  * mean of LONG values, so Σ m·x and Σ m are exact integers and the
  * replicate mean is one IEEE division — bit-identical cross-engine,
  * no order-dependent float summation anywhere. */
object Bootstrap {

  /** ⌊CDF_{Poisson(1)}(k)·2^60⌋ for k = 0..6; multiplicity =
    * #{k : u ≥ T_k} ∈ [0, 7]. */
  val Thresholds: Seq[Long] = {
    val e = math.exp(-1.0)
    // pmf(k) = e^-1 / k!
    val pmf = (0 to 6).map(k =>
      e / (1 to k).foldLeft(1.0)(_ * _.toDouble))
    val cdf = pmf.scanLeft(0.0)(_ + _).tail
    cdf.map(c => (c * math.pow(2.0, 60)).toLong)
  }

  /** Per-replicate Poisson-bootstrap means of a LONG-valued column:
    * (rep, n_eff, mean). `seedCol` must uniquely identify a row (it
    * salts the per-replicate hash); rows with null seed/value drop. */
  def replicateMeans(df: DataFrame, seedCol: Column, valueCol: Column,
                     b: Int): DataFrame = {
    require(b >= 1, s"need at least one replicate, got $b")
    val mult = Thresholds.map(t =>
      when(col("__u") >= t, 1L).otherwise(0L)).reduce(_ + _)
    // reset parallelism BEFORE the B-way fan-out: a compact parquet
    // scan can arrive in a handful of input splits, and exploding 32x
    // inside them would run the whole md5 stage at scan parallelism —
    // one cheap row-level shuffle here makes the fan-out stage wide
    df.where(seedCol.isNotNull && valueCol.isNotNull)
      .select(seedCol.cast("string").as("__seed"),
        valueCol.cast("long").as("__q"))
      .repartition(col("__seed"))
      .select(col("__seed"), col("__q"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .withColumn("__u",
        Md5Prefix(concat_ws("|", col("__seed"), col("rep")), 15))
      .withColumn("__m", mult)
      .groupBy("rep")
      .agg(sum("__m").as("n_eff"),
        sum(col("__m") * col("__q")).as("__sx"))
      .select(col("rep").cast("long").as("rep"), col("n_eff"),
        when(col("n_eff") > 0,
          col("__sx").cast("double") / col("n_eff").cast("double"))
          .otherwise(lit(0.0)).as("mean"))
  }

  /** The bootstrap interval: order the B replicate means and read the
    * ⌈α·B⌉-th and ⌈(1−α)·B⌉-th order statistics (1-based), plus the
    * full-sample point estimate — one row:
    * (b, point, ci_lo, ci_hi). The sort runs over B rows, never data. */
  def ci(df: DataFrame, seedCol: Column, valueCol: Column, b: Int,
         alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 0.5, s"alpha in (0, 0.5): $alpha")
    val loIdx = math.max(1, math.ceil(alpha * b).toInt)
    val hiIdx = math.ceil((1.0 - alpha) * b).toInt
    val reps = replicateMeans(df, seedCol, valueCol, b)
    val point = df.where(seedCol.isNotNull && valueCol.isNotNull)
      .agg(sum(valueCol.cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .select((col("__s").cast("double") / col("__n").cast("double"))
        .as("point"))
    reps.agg(sort_array(collect_list("mean")).as("__ms"))
      .select(lit(b.toLong).as("b"),
        element_at(col("__ms"), loIdx).as("ci_lo"),
        element_at(col("__ms"), hiIdx).as("ci_hi"))
      .crossJoin(point)
      .select(col("b"), col("point"), col("ci_lo"), col("ci_hi"))
  }
}
