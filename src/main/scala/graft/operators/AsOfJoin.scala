package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.time <= left.time` within the same key — the temporal lookup
  * (trade↔quote, event↔state) Spark has no built-in operator for.
  *
  * Implemented as union + window, not a range join: both sides are
  * tagged, unioned, and sorted once per key; `last(..., ignoreNulls)`
  * carries the most recent right-side payload forward onto left rows.
  * One hash shuffle on the key, no pair explosion — the scalable shape
  * for billions of rows per side (a range join would nested-loop; a
  * per-left-row subquery would be O(n*m)).
  *
  * Right-side ties on (key, time) resolve to the greatest `tiebreak`
  * value; left rows with no prior right row get nulls.
  */
object AsOfJoin {
  /** @param left      probe side
    * @param right     build side carrying `payload` columns
    * @param keys      equality keys present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right-side columns to carry onto left rows
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTime: String, rightTime: String,
            payload: Seq[String], tiebreak: Option[String] = None): DataFrame = {
    val t = "__asof_t"
    val leftCols = left.columns.toSeq
    // tag: right rows sort before left rows at equal times (<=" semantics")
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
    var r = right
      .withColumn(t, col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tie",
        tiebreak.map(col(_).cast("long")).getOrElse(lit(0L)))
    // align schemas: left's columns null on right rows and vice versa
    val rPayload = payload.map(p => s"__p_$p")
    payload.zip(rPayload).foreach { case (p, ap) => r = r.withColumnRenamed(p, ap) }
    val lAligned = rPayload.foldLeft(l)((d, ap) =>
      d.withColumn(ap, lit(null)))
    val rAligned = leftCols.filterNot(keys.contains).foldLeft(r)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))
    val unioned = UnionByName(Seq(lAligned, rAligned))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rPayload.foldLeft(unioned) { (d, ap) =>
      d.withColumn(ap, last(col(ap), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.zip(rPayload).map { case (p, ap) => col(ap).as(p) }): _*)
  }
}
