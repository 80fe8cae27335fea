package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: pair each left row with the right rows whose
  * `[lo, hi]` interval contains the left point — without the nested-loop
  * plan a raw `l.p BETWEEN r.lo AND r.hi` predicate produces.
  *
  * Blocking: intervals are exploded across fixed-width blocks they
  * overlap; points probe their single block. The theta predicate then
  * filters within block-aligned candidates, so the join is a hash
  * equi-join whose cost tracks true match density, not |L|x|R|.
  * `blockWidth` should approximate the typical interval length: wider
  * blocks mean fewer replicas but more in-block filtering.
  */
object RangeJoin {
  def pointInInterval(left: DataFrame, right: DataFrame, pointCol: String,
                      loCol: String, hiCol: String, blockWidth: Long,
                      joinType: String = "inner"): DataFrame = {
    require(blockWidth > 0, "blockWidth must be positive")
    // The theta predicate lives in the JOIN CONDITION, not a post-join
    // filter: a post-filter would drop the null-extended rows of an
    // outer join, silently degrading it to inner. Left rows keep exactly
    // one block, so "left" preserves each unmatched left row once;
    // right/full outer are rejected — unmatched intervals are exploded
    // across blocks and would surface once per block replica.
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter")(normalized),
      s"joinType must be inner or left (got $joinType): right/full outer " +
        "would duplicate unmatched intervals across block replicas")
    val l = left.withColumn("__blk", floor(col(pointCol) / blockWidth))
    val r = right.withColumn("__blk",
      explode(sequence(floor(col(loCol) / blockWidth),
        floor(col(hiCol) / blockWidth))))
    l.join(r, l("__blk") === r("__blk")
        && l(pointCol) >= r(loCol) && l(pointCol) <= r(hiCol), joinType)
      .drop(l("__blk")).drop(r("__blk"))
  }
}
