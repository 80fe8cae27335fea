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
    val l = left.withColumn("__blk", floor(col(pointCol) / blockWidth))
    val r = right.withColumn("__blk",
      explode(sequence(floor(col(loCol) / blockWidth),
        floor(col(hiCol) / blockWidth))))
    l.join(r, Seq("__blk"), joinType)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__blk")
  }
}
