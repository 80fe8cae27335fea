package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo's merge/purge) —
  * the third candidate-generation family next to LSH banding and
  * PPJoin prefix filtering: sort records inside coarse blocks by a
  * similarity-preserving key and compare each record only with its
  * `window − 1` successors. O(n·w) comparisons, no all-pairs, and the
  * classic choice when near-duplicates share long prefixes (form
  * letters, templated listings) that banding's unordered token sets
  * under-weight.
  *
  * Shape: one window (`partitionBy(block)`) plus `lead()` — NO
  * self-join, so candidate generation is a single shuffle on the block
  * key. Blocks must be chosen high-cardinality (here callers pass an
  * expression; a fixed prefix of the sort key is the norm) — the
  * per-block sort is the method's inherent sequential step, so block
  * granularity, not corpus size, bounds a task. Verification is exact
  * token-set Jaccard on the pair, computed inline via codegen
  * `array_intersect` — only the `w − 1` neighbors ever pay it.
  *
  * Output: (id_a, id_b, jaccard) for neighbor pairs with Jaccard ≥
  * `minJaccard`, jaccard floor-rounded at 1e-6; `id_a` precedes `id_b`
  * in the block's sort order. */
object SortedNeighborhood {
  def pairs(df: DataFrame, idCol: String, textCol: String,
            blockExpr: Column, sortExpr: Column, window: Int,
            minJaccard: Double): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val tokenSet = array_sort(array_distinct(
      split(trim(col(textCol)), "\\s+")))
    val base = df
      .where(col(textCol).isNotNull && length(trim(col(textCol))) > 0 &&
        col(idCol).isNotNull)
      .select(col(idCol).as("__id"), tokenSet.as("__set"),
        blockExpr.as("__blk"), sortExpr.as("__srt"))
    val w = Window.partitionBy("__blk").orderBy(col("__srt"), col("__id"))
    val nbrs = base.withColumn("__nbrs",
      array((1 until window).map(d =>
        lead(struct(col("__id"), col("__set")), d).over(w)): _*))
    val inter = size(array_intersect(col("__set"), col("__nb.__set")))
    val uni = size(col("__set")) + size(col("__nb.__set")) - inter
    nbrs
      .select(col("__id").as("id_a"), col("__set"),
        explode(col("__nbrs")).as("__nb"))
      .where(col("__nb").isNotNull)
      .select(col("id_a"), col("__nb.__id").as("id_b"),
        (floor(inter.cast("double") / uni.cast("double") * 1e6 + 0.5) /
          1e6).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }
}
