package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  * on a clean-calibration host). This probe instead reads the LEAF
  * FILE RELATIONS' byte totals off the optimized logical plan — for a
  * file source that is the file-index sum, already in memory after
  * analysis — and derives a LOWER BOUND on the split count the
  * scheduler would produce (`ceil(bytes / maxPartitionBytes)`; the
  * real `maxSplitBytes` is `<= maxPartitionBytes`, and openCost
  * packing only adds splits, so the actual FilePartition count is
  * `>=` this estimate). A lower bound is the safe direction for the
  * chains this guards: `arrivesWide` fires only when even the bound
  * clears cluster width, so a redundant spread (one shuffle of the
  * raw frame) is the worst failure, never a serialized chain.
  *
  * DELIBERATELY the UNPROJECTED relation bytes (round 19): the
  * scheduler packs FilePartitions from file lengths — a projection
  * does not change the split count of a parquet scan — whereas the
  * plan-level `stats.sizeInBytes` of a `Project` is scaled by the
  * schema-default row-width ratio, which estimates the projected
  * STREAM, not the SCAN. And plan stats are only trustworthy for file
  * leaves in the first place: a leaf without computed stats reports
  * `spark.sql.defaultSizeInBytes` (Long.MaxValue) and a join-derived
  * plan multiplies child sizes, either of which would make a narrow
  * frame probe "wide" and silently skip the spread — the exact
  * failure the spread exists to prevent. So: when every leaf of the
  * optimized plan is a file-source relation, the probe is the free
  * byte-sum bound; otherwise it falls back to the exact
  * `rdd.getNumPartitions` (correct for in-memory, checkpointed, and
  * join-derived frames, at the one-off planning cost).
  */
object ScanWidth {

  /** Total file-index bytes under `df`'s leaf file relations, or None
    * when any leaf is not a file source (no trustworthy byte statistic
    * exists there — see scaladoc). Free: the file index is already in
    * memory after analysis, no job and no physical plan. */
  private[graft] def leafFileBytes(df: DataFrame): Option[BigInt] = {
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val leafBytes = leaves.map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => Some(BigInt(fs.location.sizeInBytes))
        case _ => None
      }
      case _ => None
    }
    if (leafBytes.isEmpty || leafBytes.contains(None)) None
    else Some(leafBytes.flatten.sum)
  }

  /** Input bytes under `df`'s leaves for the size-conditional pin
    * ([[Checkpoints.pinIfLarge]]), or None when any leaf has no
    * trustworthy byte statistic. Extends [[leafFileBytes]] with the two
    * leaf shapes a pin cascade produces:
    *   - `LogicalRDD` (an upstream pin): the PERSISTED BLOCK bytes from
    *     the block-manager storage report — ground truth, already in
    *     driver memory, no job (an eager upstream pin is materialized
    *     by the time a downstream operator probes). A reliable
    *     checkpoint or an unpersisted RDD has no storage entry → None,
    *     and None means "assume large" at the caller — the scale-safe
    *     default (a cluster session with a checkpoint dir IS the
    *     large regime).
    *   - `LocalRelation` (driver-literal rows): its computed stats are
    *     exact (rows are in driver memory).
    * Plan-level stats of DERIVED nodes stay untrusted, per the
    * [[leafFileBytes]] scaladoc. */
  private[graft] def leafInputBytes(df: DataFrame): Option[BigInt] = {
    val sc = df.sparkSession.sparkContext
    lazy val storage = sc.getRDDStorageInfo
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val leafBytes = leaves.map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => Some(BigInt(fs.location.sizeInBytes))
        case _ => None
      }
      case rd: org.apache.spark.sql.execution.LogicalRDD =>
        storage.find(_.id == rd.rdd.id)
          .map(i => BigInt(i.memSize) + BigInt(i.diskSize))
      case loc: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        Some(loc.stats.sizeInBytes)
      case _ => None
    }
    if (leafBytes.isEmpty || leafBytes.contains(None)) None
    else Some(leafBytes.flatten.sum)
  }

  /** Lower-bound scan split count from the optimized plan's leaf file
    * relations, or None when any leaf is not a file source. */
  private[graft] def fileSplitsLowerBound(df: DataFrame): Option[Long] =
    leafFileBytes(df).map { bytes =>
      val maxSplit =
        BigInt(df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
      // clamp BEFORE the Long conversion: .toLong on an over-wide
      // BigInt wraps (possibly negative) instead of saturating
      ((bytes + maxSplit - 1) / maxSplit)
        .max(1).min(Long.MaxValue).toLong
    }

  /** Estimated scan split count of `df` (>= 1): the free file-bytes
    * bound when the plan is all file leaves, else the exact partition
    * count of the execution RDD. */
  def estimatedSplits(df: DataFrame): Long =
    fileSplitsLowerBound(df)
      .getOrElse(df.rdd.getNumPartitions.toLong.max(1L))

  /** True when `df`'s scan arrives at least as wide as the cluster's
    * default parallelism — i.e. a pre-spread shuffle would only add
    * cost. */
  def arrivesWide(df: DataFrame): Boolean =
    estimatedSplits(df) >=
      df.sparkSession.sparkContext.defaultParallelism
}
