package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("as-of picks the latest right row at or before each left time") {
    val trades = Seq((1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 50L, "t3"))
      .toDF("key", "t", "trade")
    val quotes = Seq(
      (1L, 90L, 9.0), (1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 300L, 30.0),
      (2L, 60L, 6.0) // after the only key-2 trade -> null
    ).toDF("key", "qt", "px")
    val got = AsOfJoin(trades, quotes, Seq("key"), "t", "qt", Seq("px"))
      .orderBy("trade")
      .collect().map(r => (r.getAs[String]("trade"), Option(r.get(3)))).toMap
    assert(got("t1") === Some(10.0)) // equal time is eligible (<=)
    assert(got("t2") === Some(20.0)) // 300 is in the future
    assert(got("t3") === None) // no quote at or before t=50
  }

  test("payload fields all come from the SAME matched row, nulls included") {
    // regression: per-column last(ignoreNulls) carry would backfill a null
    // field of the latest right row from an OLDER row, mixing two rows —
    // ASOF semantics return the single latest row including its nulls
    val l = Seq((1L, 200L)).toDF("key", "t")
    val r = Seq(
      (1L, 50L, Some(9.0), Some(7.0)), // older row: both fields set
      (1L, 100L, Some(1.0), None) // latest row: b is NULL and must stay NULL
    ).toDF("key", "qt", "a", "b")
    val got = AsOfJoin(l, r, Seq("key"), "t", "qt", Seq("a", "b")).head()
    assert(got.getAs[Double]("a") === 1.0)
    assert(got.isNullAt(got.fieldIndex("b")),
      "null field of the matched row must not be backfilled from older rows")
  }

  test("right-side ties resolve to the greatest tiebreak") {
    val l = Seq((1L, 100L)).toDF("key", "t")
    val r = Seq((1L, 100L, 1L, 10.0), (1L, 100L, 2L, 99.0))
      .toDF("key", "qt", "seq", "px")
    val got = AsOfJoin(l, r, Seq("key"), "t", "qt", Seq("px"),
      tiebreak = Some("seq")).collect()
    assert(got.head.getAs[Double]("px") === 99.0)
  }

  test("agrees with a driver-side naive as-of on real events") {
    val ev = graft.queries.tbl(spark, sf, "events")
    val got = SparkEntry.queries("asof_join")(spark, sf)
      .collect().map(r => r.getLong(1) -> Option(r.get(3))).toMap
    // naive reference
    val all = ev.select("user_id", "event_id", "ts", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val clicksBy = all.filter(_._4 == "click").groupBy(_._1)
    val ref = all.filter(_._4 == "purchase").map { case (u, eid, ts, _, _) =>
      val prior = clicksBy.getOrElse(u, Array.empty)
        .filter(_._3 <= ts)
      eid -> (if (prior.isEmpty) None
              else Some(prior.maxBy(c => (c._3, c._2))._5))
    }.toMap
    assert(got === ref)
  }
}
