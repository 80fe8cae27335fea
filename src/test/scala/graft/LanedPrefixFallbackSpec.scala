package graft

import org.apache.spark.sql.functions._
import graft.operators.LanedPrefix

/** The OVER-cap branch of the grouped laned prefix — round-14 verdict
  * item 1: the row-capped broadcast hint (`LanedPrefix.scala`) applies
  * only while the materialized (group, lane) sums frame is under
  * `BroadcastRowCap`; beyond it the joins are left to the planner —
  * exactly the path a 100× group cardinality takes — and nothing
  * executed it. This suite forces that branch at spec scale by
  * lowering the consulted cap to 0 AND disabling the planner's own
  * size-based auto-broadcast (at spec sizes the un-hinted join would
  * otherwise still broadcast, hiding the shuffle-join shape), then
  * pins (a) value-identity with the hinted run — the hint is a plan
  * annotation, never semantics — and (b) that the fallback physically
  * plans the shuffled join the cap is there to allow.
  */
class LanedPrefixFallbackSpec extends SparkTestBase {

  /** Distinct (group, value) rows with two count lanes — the grouped
    * family's input contract (one row per distinct pair). Deliberately
    * irregular: per-group domains of different sizes and offsets, so
    * cross-lane offsets differ group to group. */
  private def vals = {
    import spark.implicits._
    (0 until 12).flatMap { g =>
      (0 until 40 + 7 * g).map { v =>
        (s"g$g", (v * (g + 3) % 101).toDouble + g * 0.5,
          (v % 5 + 1).toLong, (v % 3).toLong)
      }
    }.toDF("grp", "value", "cnt", "pos")
      .groupBy("grp", "value")
      .agg(sum("cnt").as("cnt"), sum("pos").as("pos"))
  }

  private def noAutoBroadcast[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try body finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def run(): (Seq[(String, Double, Long, Long)], Seq[(String, Long, Long)]) = {
    val (out, totals) = LanedPrefix.withPrefixGrouped(vals, "grp", "value",
      Seq("cnt", "pos"), k = 64, nLanes = 4, inclusive = true)
    val o = out.select("grp", "value", "cnt_cum", "pos_cum")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        r.getLong(2), r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    val t = totals.select("grp", "cnt_tot", "pos_tot")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    (o, t)
  }

  test("over-cap fallback (small = false) is value-identical to the " +
    "hinted path and plans the shuffled join") {
    val (hintedOut, hintedTot) = run() // default cap: hinted broadcast
    val (fbOut, fbTot) = noAutoBroadcast {
      LanedPrefix.withBroadcastRowCap(0L) { run() }
    }
    assert(fbOut === hintedOut, "prefixes must not depend on the join strategy")
    assert(fbTot === hintedTot, "totals must not depend on the join strategy")
    // sanity on the math itself: last inclusive prefix == group total
    val lastByGroup = hintedOut.groupBy(_._1).map { case (g, rows) =>
      (g, rows.last._3, rows.last._4)
    }.toSeq.sortBy(_._1)
    assert(lastByGroup === hintedTot)
  }

  test("the un-hinted offsets join physically sort-merges once past the cap") {
    noAutoBroadcast {
      LanedPrefix.withBroadcastRowCap(0L) {
        val (out, _) = LanedPrefix.withPrefixGrouped(vals, "grp", "value",
          Seq("cnt"), k = 64, nLanes = 4, inclusive = true)
        out.collect() // materialize: AQE finalizes the physical plan
        val p = out.queryExecution.executedPlan.toString
        // the OFFSETS join — keyed on (group, bucket) — must shuffle-join;
        // the cut-table join inside qsketchRangeBucketsGrouped stays
        // broadcast regardless (explicit hint on a ≤ nLanes-row table),
        // so the assertion targets join keys, not mere node presence
        assert(p.linesIterator.exists(l =>
            l.contains("SortMergeJoin") && l.contains("bucket")),
          s"over-cap fallback should sort-merge the offsets join:\n$p")
        assert(!p.linesIterator.exists(l =>
            l.contains("BroadcastHashJoin") && l.contains("bucket")),
          s"the (group, bucket) join must not broadcast with the hint " +
            s"withheld and auto-broadcast off:\n$p")
      }
    }
  }

  test("gate-surface caller stays hash-identical through the fallback " +
    "(agg_gini_grouped end-to-end)") {
    val hinted = SparkEntry.queries("agg_gini_grouped")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val fb = noAutoBroadcast {
      LanedPrefix.withBroadcastRowCap(0L) {
        SparkEntry.queries("agg_gini_grouped")(spark, sf)
          .collect().map(_.toSeq).toSeq
      }
    }
    assert(fb === hinted)
  }
}
