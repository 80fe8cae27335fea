package graft.operators

import org.apache.spark.sql.SparkSession

/** Static planning for FIXED-SHAPE iteration bodies.
  *
  * AQE re-plans at every exchange, which it executes as its own stage
  * JOB — the right trade for one data-dependent corpus query, and the
  * wrong one inside a fixpoint/merge loop whose per-round plan shape
  * is constant over pinned or persisted blocks of known, bounded size:
  * there the re-planning cannot change the plan, but each round books
  * 4-16 scheduler round-trips instead of one per action. The r17/r18
  * drift forensics measured the per-job constant at 60-100 ms on a
  * contended host, and on a saturated 1000-executor cluster the
  * DRIVER pays it; `Dedup.connectedComponents` dropped 99 → 29 jobs
  * at identical output when its rounds went static (round 19).
  *
  * Scope the block to the LOOP ONLY — corpus-scale stages before it
  * (candidate generation, the vocabulary build) keep the session's
  * adaptivity, where skew handling and join re-planning earn their
  * jobs. The conf flip is driver-side sequential state on the shared
  * session, same as `SparkContext.setCheckpointDir`; the prior value
  * is always restored.
  */
object StaticPlanning {

  /** Run `body` (whose ACTIONS execute fixed-shape plans) with AQE
    * off, restoring the session's previous setting afterwards. */
  def statically[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key)
    try { spark.conf.set(key, "false"); body }
    finally spark.conf.set(key, before)
  }
}
