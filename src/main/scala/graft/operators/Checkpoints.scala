package graft.operators

import org.apache.spark.sql.DataFrame

/** The one lineage-truncation dual every iterative / multi-scan
  * operator shares: RELIABLE `checkpoint()` into an HDFS/object-store
  * directory when the caller supplies one (survives executor loss — at
  * the 100 TB target a corpus-sized `localCheckpoint` block has no
  * lineage to recover it, so one lost executor kills the job), and
  * `localCheckpoint()` when it doesn't (dev/local — no disk
  * round-trip). Both are EAGER, so a pinned frame costs exactly one
  * job and every downstream scan replays the materialized blocks.
  *
  * The session checkpoint directory is GLOBAL state
  * (`SparkContext.setCheckpointDir`), so this helper only sets it when
  * none is configured yet: a caller-supplied dir must not silently
  * clobber a directory the application (or an enclosing operator on
  * the same session) already configured — when one is set, it wins and
  * the reliable checkpoint lands there.
  */
object Checkpoints {

  /** Pin `df` eagerly: reliable `checkpoint()` when `checkpointDir` is
    * set (or the session already has a checkpoint dir), else
    * `localCheckpoint()`. */
  def pin(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }

  /** SESSION-DEFAULT pin (round 19): reliable `checkpoint()` when the
    * session already has a checkpoint directory configured, else
    * `localCheckpoint()`. Query-composition glue (the capstone
    * pipelines, shared edge lists, cleaned-corpus pins) pins through
    * this so a production session that calls `sc.setCheckpointDir(...)`
    * ONCE gets durable pins in every composed pipeline, without
    * threading a dir parameter through each query definition — the
    * operator-level overload above remains for callers that manage the
    * dir explicitly. */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
