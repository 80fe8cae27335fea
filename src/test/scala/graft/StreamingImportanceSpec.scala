package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dsir
import graft.streaming.StreamingImportance
import graft.streaming.StreamingImportance.{IEvent, IState}

/** The streaming importance selector: bounded fold semantics, stream ==
  * batch replay across micro-batch splits, two-level == global top-k. */
class StreamingImportanceSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, key: Long): IEvent =
    IEvent((id % 4).toInt, id, isTarget = id % 2 == 0, nTokens = 10L + id,
      logwPpm = key - 1000L, keyPpm = key)

  test("fold keeps the k best keys, ties to the smaller id, and is " +
    "idempotent under re-delivery") {
    val z = IState(0, 0L, Nil, Nil, Nil, Nil, Nil)
    val evs = Seq(ev(8, 50L), ev(4, 70L), ev(12, 50L), ev(16, 90L))
    val s = evs.foldLeft(z)((acc, e) => StreamingImportance.fold(acc, e, 3))
    assert(s.keys.toSeq === Seq(90L, 70L, 50L))
    assert(s.ids.toSeq === Seq(16L, 4L, 8L), "key tie at 50 -> smaller id")
    val re = StreamingImportance.fold(s, ev(16, 90L), 3)
    assert(re.ids === s.ids && re.keys === s.keys,
      "a re-delivered row folds onto itself")
    assert(re.n === s.n + 1, "n counts deliveries")
  }

  test("fold is arrival-order invariant") {
    val z = IState(0, 0L, Nil, Nil, Nil, Nil, Nil)
    val evs = (1L to 9L).map(i => ev(i * 4, (i * 37) % 100))
    val a = evs.foldLeft(z)((acc, e) => StreamingImportance.fold(acc, e, 4))
    val b = evs.reverse.foldLeft(z)((acc, e) =>
      StreamingImportance.fold(acc, e, 4))
    assert(a.ids === b.ids && a.keys === b.keys)
  }

  test("streamed end state equals the batch replay, micro-batch split " +
    "notwithstanding; merged equals the one-shot global top-k") {
    val docs = (1 to 60).map { i =>
      val lang = if (i % 3 == 0) "en" else "fr"
      (i.toLong, s"alpha w$i beta gamma", lang)
    }.toDF("doc_id", "text", "lang")
    val keyed = Dsir.withGumbelKey(
      Dsir.importanceWeights(docs, "doc_id", "text",
        col("lang") === "en", buckets = 256)).localCheckpoint()
    val k = 5
    val events = keyed.select(
        pmod(col("id"), lit(4)).cast("int").as("shard"), col("id"),
        col("is_target").as("isTarget"), col("n_tokens").as("nTokens"),
        col("logw_ppm").as("logwPpm"), col("key_ppm").as("keyPpm"))
      .as[IEvent].collect().toSeq
    val (b1, b2) = events.splitAt(events.size / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[IEvent]
    val q = StreamingImportance.topKStream(input.toDS(), k)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_imp_test").start()
    val streamed = try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      spark.table("stream_imp_test").as[IState].collect()
        .groupBy(_.shard).map { case (sh, rows) =>
          sh -> rows.maxBy(_.n) // latest emission IS the state
        }
    } finally q.stop()
    val replay = StreamingImportance.replayShards(keyed,
        pmod(col("id"), lit(4)), 4, k)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(5)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (-t._3, t._2)).map(_._2).toSeq).toMap
    assert(streamed.keySet === replay.keySet)
    streamed.foreach { case (sh, st) =>
      assert(st.ids.toSeq === replay(sh),
        s"shard $sh: streamed kept set must equal the batch replay")
    }
    val merged = StreamingImportance.merged(
        StreamingImportance.replayShards(keyed,
          pmod(col("id"), lit(4)), 4, k), k)
      .collect().map(_.getLong(0)).toSeq
    val oneShot = Dsir.gumbelTopK(
      keyed.drop("key_ppm"), k).collect().map(_.getLong(0)).toSeq
    assert(merged === oneShot,
      "two-level shard top-k must equal the one-shot global top-k")
  }
}
