package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column row/null/distinct counts — the
  * data-quality summary every ingestion pipeline runs before trusting a
  * new drop of data.
  *
  * All columns profile in a SINGLE aggregation over a single scan: the
  * per-column stats are parallel aggregate expressions in one `agg`, and
  * the wide 1-row result pivots to one-row-per-column with a driver-free
  * `explode` of an inline struct array. The multi-column distinct counts
  * expand the input (Spark plans n distinct aggregates as an Expand ×n
  * over the grouping) — exact mode is the oracle-checkable gate shape;
  * at 100 TB pass `exact = false` for `approx_count_distinct` (HLL), which
  * keeps the pass to one non-expanded scan with bounded sketch state.
  */
object Profile {

  def apply(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: no columns")
    def nd(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs: Seq[Column] =
      count(lit(1)).as("__rows") +:
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1).otherwise(0)).as(s"__null_$c"),
          nd(c).as(s"__nd_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = explode(array(cols.map(c => struct(
      lit(c).as("col_name"),
      col("__rows").as("n_rows"),
      col(s"__null_$c").as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      round(col(s"__null_$c") / col("__rows"), 4).as("null_frac"))): _*))
    wide.select(stacked.as("p")).select("p.*")
  }
}
