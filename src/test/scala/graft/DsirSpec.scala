package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir
import graft.textanalysis.PerplexityBuckets

/** Property pins for the data-selection tier: DSIR importance weights
  * (sign, exactness, target/pool semantics), Gumbel top-k determinism,
  * and the CCNet tercile triage invariants. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta alpha", "en"),
    (2L, "alpha beta gamma", "en"),
    (3L, "delta epsilon zeta", "fr"),
    (4L, "delta delta epsilon", "fr"),
    (5L, "alpha delta", "de"),
    (6L, "   ", "en"), // whitespace-only: drops
    (7L, "beta beta beta beta", "en"))
    .toDF("doc_id", "text", "lang")

  test("dsir: target-vocabulary docs score above pool-only-vocabulary " +
    "docs, and weights are exact longs") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("lang") === "en", buckets = 64)
      .orderBy("id").collect()
    assert(w.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 7L),
      "empty doc drops, everything else scores")
    val byId = w.map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(1L)._1 && !byId(3L)._1)
    assert(byId(1L)._2 === 3L && byId(3L)._2 === 3L)
    // doc 1 is pure target vocabulary, doc 3 pure non-target: the
    // importance weight must strictly separate them
    assert(byId(1L)._3 > byId(3L)._3,
      s"target-like ${byId(1L)._3} must beat pool-like ${byId(3L)._3}")
    // per-token log-ratio of a never-in-target token is negative
    assert(byId(3L)._3 < 0L)
  }

  test("dsir: per-doc weight equals the sum of its tokens' bucket " +
    "log-ratios (replayed by hand)") {
    val B = 64
    val toks = corpus
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), (col("lang") === "en").as("__t"),
        explode(split(trim(col("text")), "\\s+")).as("__w"))
      .withColumn("__b",
        graft.dedup.Dedup.md5WordHash32(col("__w")) % B)
    val lr = Dsir.logRatios(
      toks.select(col("doc_id").as("id"), col("__t"), col("__b")), B)
      .select(col("bucket").as("__b"), col("log_ratio_ppm"))
    val manual = toks.join(lr, "__b").groupBy("doc_id")
      .agg(sum("log_ratio_ppm").as("logw_ppm"))
    val got = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("lang") === "en", buckets = B)
      .select(col("id").as("doc_id"), col("logw_ppm"))
    assert(got.except(manual).isEmpty && manual.except(got).isEmpty)
  }

  test("gumbel top-k: deterministic, k-bounded, and monotone in the " +
    "weight for a fixed id (same Gumbel draw)") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("lang") === "en", buckets = 64)
    val a = Dsir.gumbelTopK(w, k = 3).collect().map(_.getLong(0)).toSeq
    val b = Dsir.gumbelTopK(w, k = 3).collect().map(_.getLong(0)).toSeq
    assert(a === b, "same input, same selected set, same order")
    assert(a.size === 3)
    // key = logw + gumbel(id): raising one doc's weight can only
    // raise its key
    val boosted = w.withColumn("logw_ppm",
      when(col("id") === 3L, col("logw_ppm") + 100000000L)
        .otherwise(col("logw_ppm")))
    val c = Dsir.gumbelTopK(boosted, k = 3).collect()
      .map(_.getLong(0)).toSeq
    assert(c.contains(3L), "a +100 log-weight boost must win a slot")
  }

  test("ccnet: every language splits into non-empty value-ordered " +
    "buckets, head scores >= tail scores") {
    val docs = (1 to 90).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      // vary vocabulary rarity so scores spread
      val w = s"w${i % 9}"
      (i.toLong, s"$w $w common common", lang)
    }.toDF("doc_id", "text", "lang")
    val sum = PerplexityBuckets.summary(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5)))
    val langs = sum.map(_._1).distinct.sorted
    assert(langs.toSeq === Seq("en", "fr"))
    for (l <- langs) {
      val m = sum.filter(_._1 == l).map(t => t._2 -> t).toMap
      assert(m.keySet.subsetOf(Set("head", "middle", "tail")))
      for {
        h <- m.get("head"); t <- m.get("tail")
      } assert(h._4 >= t._5,
        s"$l: head min ${h._4} must be >= tail max ${t._5}")
      assert(sum.filter(_._1 == l).map(_._3).sum === 45L,
        s"$l: every scored doc lands in exactly one bucket")
    }
  }

  test("ccnet: per-lang model means a doc's score only depends on its " +
    "own language's corpus") {
    val base = Seq(
      (1L, "a a b", "en"), (2L, "a b c", "en"), (3L, "a c c", "en"))
      .toDF("doc_id", "text", "lang")
    val withNoise = base.union(Seq(
      (10L, "x y z", "fr"), (11L, "x x y", "fr"), (12L, "y z z", "fr"))
      .toDF("doc_id", "text", "lang"))
    val a = PerplexityBuckets.perLangLogprob(base, "doc_id", "text",
      "lang").where(col("lang") === "en")
    val b = PerplexityBuckets.perLangLogprob(withNoise, "doc_id",
      "text", "lang").where(col("lang") === "en")
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "adding French docs must not move English scores")
  }

  test("ccnet streaming twin: a REAL keyedStream run over the scores " +
    "lands the same cuts — and hence the same triage summary — as the " +
    "batch replay streamingSummary uses") {
    import graft.streaming.StreamingQsketch
    import graft.streaming.StreamingQsketch.KQEvent
    val docs = (1 to 60).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      (i.toLong, s"w${i % 7} w${i % 5} common common", lang)
    }.toDF("doc_id", "text", "lang")
    val scores = PerplexityBuckets.perLangLogprob(docs, "doc_id",
      "text", "lang").localCheckpoint()
    // drive the live micro-batch path in two splits
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val evs = scores.select(col("lang"),
        StreamingQsketch.hashCol(col("id")).as("h"),
        col("avg_logprob")).collect()
      .map(r => KQEvent(r.getString(0), r.getLong(1), r.getDouble(2)))
    val input = MemoryStream[KQEvent]
    val q = StreamingQsketch.keyedStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_ccnet_test").start()
    val streamedStates = try {
      val (b1, b2) = evs.splitAt(25)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      spark.table("stream_ccnet_test").collect()
        .groupBy(_.getString(0))
        .map { case (_, rows) => rows.maxBy(_.getLong(1)) }.toSeq
    } finally q.stop()
    import spark.implicits._
    val streamedCuts = StreamingQsketch.keyedQuantiles(
        streamedStates.map(r => (r.getString(0), r.getLong(1),
          r.getSeq[Long](2), r.getSeq[Double](3)))
          .toDF("key", "n", "hs", "vs"),
        Seq("q33" -> (1.0 / 3.0), "q67" -> (2.0 / 3.0)))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2))).toSet
    val batchCuts = StreamingQsketch.keyedQuantiles(
        StreamingQsketch.keyedEndStates(scores, "lang", col("id"),
          "avg_logprob"),
        Seq("q33" -> (1.0 / 3.0), "q67" -> (2.0 / 3.0)))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2))).toSet
    assert(streamedCuts === batchCuts,
      "live stream and batch replay must read off identical cuts")
    // summary shape sanity on the composed operator
    val sum = PerplexityBuckets.streamingSummary(docs, "doc_id", "text",
      "lang").collect()
    assert(sum.map(_.getLong(2)).sum === 60L,
      "every scored doc lands in exactly one bucket")
  }
}
