package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDecay
import graft.streaming.StreamingDecay.{DcEvent, DcState}

/** The streaming decayed-count state vs its order-free batch end
  * state: micro-batch splits, arrival order, lane merges, and the
  * decay-rotation edge cases must all land on the same bounded
  * counts-per-age state. (A pre-weighted scalar state fails exactly
  * here: two weight-2^0 terms carry into 2^1 and survive a shift the
  * true per-term decay kills — the carry test below pins it.) */
class StreamingDecaySpec extends SparkTestBase {
  import spark.implicits._

  private def endOf(evs: Seq[DcEvent])
      : Map[String, (Long, Seq[Long], Long)] =
    StreamingDecay.endStates(evs.toDF("key", "day"), "key", "day")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](2), r.getLong(3)))).toMap

  private def foldAll(k: String, days: Seq[Long]): DcState =
    days.foldLeft(DcState(k, 0L, Seq.fill(41)(0L), 0L))(
      (acc, d) => StreamingDecay.fold(acc, d))

  test("fold is order-free and equals the batch end state") {
    val rnd = new scala.util.Random(7)
    val evs = Seq.fill(200)(DcEvent(s"k${rnd.nextInt(3)}",
      100L + rnd.nextInt(60)))
    val want = endOf(evs)
    (1 to 5).foreach { i =>
      val shuffled = rnd.shuffle(evs)
      val got = shuffled.groupBy(_.key).map { case (k, rows) =>
        val s = foldAll(k, rows.map(_.day))
        k -> ((s.ref_day, s.counts, s.n))
      }
      assert(got === want, s"permutation $i diverged")
    }
  }

  test("carry regression: two age-cap events vanish under a 1-day shift") {
    // two events at the horizon (weight 2^0 each) then one newer day:
    // a pre-weighted scalar sums them to 2^1 and a right shift keeps
    // 2^0; the true decay is 0 + 0 (both terms age past the cap)
    val cap = StreamingDecay.CapDays
    val s = foldAll("k", Seq(0L, 0L, cap.toLong, cap.toLong + 1))
    // day-0 events now have age cap+1 -> dropped from the array
    assert(s.counts.sum === 2L, "only the in-horizon events survive")
    assert(s.counts(0) === 1L && s.counts(1) === 1L)
    assert(s.n === 4L, "n still counts every event ever seen")
  }

  test("decay rotation: ages grow, beyond-cap buckets drop") {
    var s = foldAll("k", Seq(100L, 101L))
    assert(s.counts(0) === 1L && s.counts(1) === 1L && s.ref_day === 101L)
    s = StreamingDecay.fold(s, 101L + StreamingDecay.CapDays + 1)
    assert(s.counts.sum === 1L && s.counts(0) === 1L,
      "a cap+1 jump clears the old horizon")
    // an event already older than the cap counts toward n only
    s = StreamingDecay.fold(s, s.ref_day - StreamingDecay.CapDays - 1)
    assert(s.counts.sum === 1L && s.n === 4L)
  }

  test("micro-batch split invariance + lane merge equals global formula") {
    val evs = Seq(
      DcEvent("a", 10), DcEvent("a", 10), DcEvent("a", 12),
      DcEvent("b", 11), DcEvent("b", 50), DcEvent("a", 49))
    val (b1, b2) = evs.splitAt(3)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DcEvent]
    val q = StreamingDecay.decayStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_decay_test").start()
    val streamed = try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      spark.table("stream_decay_test").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2),
          r.getLong(3)))
        .groupBy(_._1).map { case (k, rows) =>
          k -> rows.maxBy(_._4) // latest emission (max n) IS the state
        }
    } finally q.stop()
    val want = endOf(evs)
    streamed.foreach { case (k, (_, ref, counts, n)) =>
      assert((ref, counts, n) === want(k),
        s"streamed end state for $k must match the batch end state")
    }
    // merge lands on the global-ref formula: gref = 50;
    // a: days 10,10 (age 40 -> 2^0 each), 12 (age 38 -> 2^2),
    //    49 (age 1 -> 2^39); b: 11 (age 39 -> 2^1), 50 (age 0 -> 2^40)
    val merged = StreamingDecay.merged(
        StreamingDecay.endStates(evs.toDF("key", "day"), "key", "day"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2))).sortBy(_._1)
    val scale = (1L << 40).toDouble
    assert(merged.toSeq === Seq(
      ("a", 4L, ((1L << 39) + 2L + 4L).toDouble / scale),
      ("b", 2L, ((1L << 40) + 2L).toDouble / scale)))
  }
}
