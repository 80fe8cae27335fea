package graft.operators

import org.apache.spark.sql.DataFrame

/** Cheap "does this frame arrive narrower than the cluster" probe for
  * the adaptive pre-spread in per-row-heavy chains (the gram explode,
  * the media decode): a compact scan lands in one or two splits, which
  * would serialize CPU-bound work on one core — but the spread is a
  * full shuffle of the frame, so at target scale (a scan already
  * thousands of splits wide) it must NOT run, and the probe deciding
  * that must itself be cheap.
  *
  * The first implementation asked `df.rdd.getNumPartitions`, which is
  * exact but builds the frame's EXECUTION RDD — physical planning plus
  * a janino whole-stage-codegen compile for the scan stage, measured
  * at ~0.1-0.3 s per call (the r18 closing pair booked the constant on
  * every gate that probes: `mm_jpeg_real` 0.21 → 0.39 s best-of-pair
  * on a clean-calibration host). This probe instead reads the
  * OPTIMIZED logical plan's size statistic — for file relations that
  * is the file-index byte sum, already in memory after analysis — and
  * derives the split count the scheduler would produce
  * (`ceil(bytes / spark.sql.files.maxPartitionBytes)`). No physical
  * plan, no codegen, no job. The estimate errs small for splittable
  * formats with many small files (openCostInBytes packing), which
  * errs toward spreading — the safe direction for the chains this
  * guards: a redundant spread costs one shuffle of the raw frame, a
  * missing spread serializes the whole chain.
  */
object ScanWidth {

  /** Estimated scan split count of `df` (>= 1). */
  def estimatedSplits(df: DataFrame): Long = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxSplit = BigInt(df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    ((bytes + maxSplit - 1) / maxSplit).max(1).toLong
  }

  /** True when `df`'s scan arrives at least as wide as the cluster's
    * default parallelism — i.e. a pre-spread shuffle would only add
    * cost. */
  def arrivesWide(df: DataFrame): Boolean =
    estimatedSplits(df) >=
      df.sparkSession.sparkContext.defaultParallelism
}
