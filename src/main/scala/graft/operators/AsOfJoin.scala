package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join with the three pandas-`merge_asof` directions — the
  * temporal lookup (trade↔quote, event↔state) Spark has no built-in
  * operator for:
  *
  *  - [[AsOfJoin.Backward]] (default): latest right row with
  *    `right.time <= left.time` per key;
  *  - [[AsOfJoin.Forward]]: earliest right row with
  *    `right.time >= left.time`;
  *  - [[AsOfJoin.Nearest]]: whichever of the two is closer in absolute
  *    time; exact ties resolve BACKWARD (documented, deterministic).
  *
  * Implemented as union + window, not a range join: both sides are
  * tagged, unioned, and sorted once per key; a single
  * `last/first(struct(payload*), ignoreNulls)` carries the adjacent
  * right ROW onto left rows. Carrying one struct (not one window call
  * per column) keeps the match atomic: every payload field comes from
  * the same right row, including its nulls — a per-column carry would
  * backfill a null field from an older row. One hash shuffle on the
  * key, no pair explosion — the scalable shape for billions of rows
  * per side. Nearest runs the union+window twice (both passes shuffle
  * on the same key, so the second exchange reuses the partitioning;
  * the extra cost is one sort).
  *
  * Right-side ties on (key, time) resolve to the greatest `tiebreak`
  * value in every direction; left rows with no qualifying right row
  * get nulls in all payload columns. Nearest requires the time columns
  * to be integral (epoch ns/us) for the distance arithmetic.
  *
  * The two pandas `merge_asof` knobs are supported:
  *
  *  - `tolerance`: a match farther than this (in the time column's own
  *    unit) is dropped — payload goes null, as if no right row
  *    qualified. Applied per direction (Nearest drops a side before
  *    picking). Requires integral time columns.
  *  - `allowExactMatches = false`: strict inequality — an equal-time
  *    right row no longer matches. Implemented purely by the union-sort
  *    side tags: ordering the left row BEFORE its equal-time right rows
  *    puts them outside the window frame, so strictness costs nothing.
  */
object AsOfJoin {
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction
  case object Nearest extends Direction

  /** @param left      probe side
    * @param right     build side carrying `payload` columns
    * @param keys      equality keys present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right-side columns to carry onto left rows
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTime: String, rightTime: String, payload: Seq[String],
            tiebreak: Option[String] = None,
            direction: Direction = Backward,
            tolerance: Option[Long] = None,
            allowExactMatches: Boolean = true): DataFrame = {
    if (payload.isEmpty) return left
    tolerance.foreach(tol => require(tol >= 0, s"negative tolerance $tol"))
    if (tolerance.isDefined) requireIntegralTimes(left, right, leftTime,
      rightTime, "tolerance")
    // null out a carried match farther than the tolerance (per direction)
    def clip(outCol: String, forward: Boolean): Column = tolerance match {
      case None => col(outCol)
      case Some(tol) =>
        val d =
          if (forward)
            col(outCol).getField("__mt").cast("long") -
              col(leftTime).cast("long")
          else
            col(leftTime).cast("long") -
              col(outCol).getField("__mt").cast("long")
        when(col(outCol).isNull || d <= tol, col(outCol))
    }
    val leftCols = left.columns.toSeq
    direction match {
      case Backward | Forward =>
        carry(left, right, keys, leftTime, rightTime, payload, tiebreak,
          forward = direction == Forward, out = "__pay",
          allowExact = allowExactMatches)
          .withColumn("__pay", clip("__pay", direction == Forward))
          .select((leftCols.map(col) ++
            payload.map(p => col("__pay").getField(p).as(p))): _*)
      case Nearest =>
        requireIntegralTimes(left, right, leftTime, rightTime, "Nearest")
        val b = carry(left, right, keys, leftTime, rightTime, payload,
          tiebreak, forward = false, out = "__payb",
          allowExact = allowExactMatches)
        val carried = carry(b, right, keys, leftTime, rightTime, payload,
          tiebreak, forward = true, out = "__payf",
          allowExact = allowExactMatches)
        // only add the clip projections when a tolerance exists — an
        // identity rewrite of the carried structs is not free, it blocks
        // projection collapsing across the two window stages
        val bf =
          if (tolerance.isEmpty) carried
          else carried
            .withColumn("__payb", clip("__payb", forward = false))
            .withColumn("__payf", clip("__payf", forward = true))
        val t = col(leftTime).cast("long")
        val bt = col("__payb").getField("__mt").cast("long")
        val ft = col("__payf").getField("__mt").cast("long")
        val chosen = when(col("__payb").isNull, col("__payf"))
          .when(col("__payf").isNull, col("__payb"))
          .when(t - bt <= ft - t, col("__payb")) // tie -> backward
          .otherwise(col("__payf"))
        bf.withColumn("__pick", chosen)
          .select((leftCols.map(col) ++
            payload.map(p => col("__pick").getField(p).as(p))): _*)
    }
  }

  /** Distance arithmetic casts times to long — a timestamp would
    * silently degrade to second granularity, so refuse it. */
  private def requireIntegralTimes(left: DataFrame, right: DataFrame,
                                   leftTime: String, rightTime: String,
                                   what: String): Unit =
    Seq(left.schema(leftTime) -> leftTime,
        right.schema(rightTime) -> rightTime).foreach { case (f, n) =>
      import org.apache.spark.sql.types._
      val integral = f.dataType match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      }
      require(integral,
        s"$what needs an integral (epoch ns/us) time column; " +
          s"'$n' is ${f.dataType.simpleString}")
    }

  /** Union + single window carry in one direction; output keeps the
    * left frame's columns plus `out` = struct(payload*, __mt =
    * matched right time), null when nothing qualifies. */
  private def carry(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTime: String, rightTime: String,
                    payload: Seq[String], tiebreak: Option[String],
                    forward: Boolean, out: String,
                    allowExact: Boolean = true): DataFrame = {
    val t = "__asof_t"
    val leftCols = left.columns.toSeq
    val payType = StructType(payload.map(p => right.schema(p)) :+
      StructField("__mt", right.schema(rightTime).dataType))
    // side tags order right rows INSIDE the frame at equal times:
    // backward (frame = preceding..current, last()): right before left;
    // forward (frame = current..following, first()): left before right.
    // STRICT mode flips the tags — the left row then sorts before
    // (backward) / after (forward) its equal-time rights, which pushes
    // them outside the frame: strictness purely by sort order.
    val (leftTag, rightTag) =
      if (forward ^ !allowExact) (0, 1) else (1, 0)
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn("__side", lit(leftTag))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn(out, lit(null).cast(payType))
    val r = right
      .withColumn(t, col(rightTime))
      .withColumn("__side", lit(rightTag))
      .withColumn("__tie",
        tiebreak.map(col(_).cast("long")).getOrElse(lit(0L)))
      .withColumn(out,
        struct(payload.map(col) :+ col(rightTime).as("__mt"): _*))
      .select((keys ++ Seq(t, "__side", "__tie", out)).map(col): _*)
    val unioned = UnionByName(Seq(l, r))

    // greatest tiebreak wins in both directions: ascending ties feed
    // last(), descending ties feed first()
    val tieOrd: Column = if (forward) col("__tie").desc else col("__tie").asc
    val w0 = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t).asc, col("__side").asc, tieOrd)
    val (w, pick) =
      if (forward)
        (w0.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col(out), ignoreNulls = true).over(
            w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      else
        (w0.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col(out), ignoreNulls = true).over(
            w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    unioned
      .withColumn(out, pick)
      .filter(col("__side") === leftTag)
      .select((leftCols :+ out).map(col): _*)
  }
}
