package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.streaming.StreamingFunnel

/** Streaming funnel tracker: batch-twin equivalence on ordered feeds,
  * within-batch reordering tolerance, and the at-most-once emission
  * contract. */
class StreamingFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")
  private def ts(m: Long) = new java.sql.Timestamp(1704067200000L + m * 60000L)

  private def runStream(name: String,
      batches: Seq[Seq[(Long, String, java.sql.Timestamp)]]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingFunnel.funnelProgress(
      input.toDF().toDF("user_id", "event_type", "t"),
      "t", "10 minutes", "user_id", "event_type", steps)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
  }

  test("ordered feed reproduces the batch funnel exactly") {
    // u1 completes all three; u2's click precedes its view (stalls at
    // view); u3 views+clicks only — the AnalyticsSpec.funnel fixture
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      (2L, "click", ts(0)), (2L, "view", ts(10)), (2L, "purchase", ts(20)),
      (3L, "view", ts(0)), (3L, "click", ts(5)))
    // split mid-funnel so progress must survive across batches
    runStream("sf_ordered", Seq(
      events.filter(_._3.getTime <= ts(5).getTime),
      events.filter(e => e._3.getTime > ts(5).getTime)))
    val got = spark.table("sf_ordered")
      .groupBy("step_idx").agg(count(lit(1)).as("n_users"))
      .orderBy("step_idx").as[(Int, Long)].collect()
    val want = Analytics.funnel(
      events.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", steps)
      .filter(col("n_users") > 0)
      .orderBy("step_idx")
      .select(col("step_idx"), col("n_users")).as[(Int, Long)].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("within-batch arrival order never matters (handler sorts)") {
    // whole funnel delivered in one batch, REVERSED arrival order
    val events = Seq((7L, "purchase", ts(20)), (7L, "click", ts(10)),
      (7L, "view", ts(0)))
    runStream("sf_reversed", Seq(events))
    val got = spark.table("sf_reversed").select("step_idx")
      .as[Int].collect().sorted
    assert(got.toSeq === Seq(1, 2, 3))
  }

  test("progressReplay is the exact batch twin of the streamed StepDone rows") {
    // the full fixture zoo: completes, out-of-order stall, partial,
    // duplicate + same-instant tie — split across two batches
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      (2L, "click", ts(0)), (2L, "view", ts(10)), (2L, "purchase", ts(20)),
      (3L, "view", ts(0)), (3L, "click", ts(5)),
      (9L, "view", ts(0)), (9L, "view", ts(1)), (9L, "click", ts(0)))
    runStream("sf_twin", Seq(
      events.filter(_._3.getTime <= ts(5).getTime),
      events.filter(_._3.getTime > ts(5).getTime)))
    val got = spark.table("sf_twin").select("user", "step_idx", "ts")
      .as[(Long, Int, java.sql.Timestamp)].collect()
      .map(r => (r._1, r._2, r._3.getTime)).toSeq.sorted
    val want = StreamingFunnel.progressReplay(
        events.toDF("user_id", "event_type", "t"),
        "user_id", "event_type", "t", steps)
      .select("user_id", "step_idx", "ts")
      .as[(Long, Int, java.sql.Timestamp)].collect()
      .map(r => (r._1, r._2, r._3.getTime)).toSeq.sorted
    assert(want.nonEmpty && got === want)
  }

  test("each (user, step) emits at most once; equal times don't advance") {
    // duplicate views, and a click at the SAME instant as the view
    // (strictly-after rule: must not count)
    val events = Seq((9L, "view", ts(0)), (9L, "view", ts(1)),
      (9L, "click", ts(0)))
    runStream("sf_once", Seq(events))
    val rows = spark.table("sf_once")
      .select("user", "step_idx").as[(Long, Int)].collect()
    assert(rows.toSeq === Seq((9L, 1)))
  }
}
