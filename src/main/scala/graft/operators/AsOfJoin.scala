package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, the latest right row with
  * `right.time <= left.time` within the same key — the temporal lookup
  * (trade↔quote, event↔state) Spark has no built-in operator for.
  *
  * Implemented as union + window, not a range join: both sides are
  * tagged, unioned, and sorted once per key; a single
  * `last(struct(payload*), ignoreNulls)` carries the most recent right
  * ROW forward onto left rows. Carrying one struct (not one window call
  * per column) keeps the match atomic: every payload field comes from
  * the same right row, including its nulls — matching ASOF JOIN
  * semantics (a per-column carry would backfill a null field from an
  * older row). One hash shuffle on the key, no pair explosion — the
  * scalable shape for billions of rows per side.
  *
  * Right-side ties on (key, time) resolve to the greatest `tiebreak`
  * value; left rows with no prior right row get nulls in all payload
  * columns.
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
    if (payload.isEmpty) return left
    val t = "__asof_t"
    val leftCols = left.columns.toSeq
    val payType = StructType(payload.map(p => right.schema(p)))
    // tag: right rows sort before left rows at equal times ("<=" semantics)
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__pay", lit(null).cast(payType))
    val r = right
      .withColumn(t, col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tie",
        tiebreak.map(col(_).cast("long")).getOrElse(lit(0L)))
      .withColumn("__pay", struct(payload.map(col): _*))
      .select((keys ++ Seq(t, "__side", "__tie", "__pay")).map(col): _*)
    // union-by-name fills left-only columns with nulls on right rows
    val unioned = UnionByName(Seq(l, r))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.map(p => col("__pay").getField(p).as(p))): _*)
  }
}
