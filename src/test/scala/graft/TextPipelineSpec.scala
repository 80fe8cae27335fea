package graft

import org.apache.spark.sql.functions._
import graft.textanalysis.{Decontaminate, TextAnalysis}

/** Hand-computed oracles for the round-6 text-pipeline operators:
  * chunking, repetition signals, TF-IDF, decontamination. */
class TextPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("tokenChunks covers every token, stride overlap, short tail") {
    // 10 tokens, size 4, stride 3 -> starts 1,4,7 (upper = 10-1 = 9 -> 1,4,7)
    val d = docs(1L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")
    val out = TextAnalysis.tokenChunks(d, "doc_id", "text", 4, 3)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
    assert(out.map(_.getString(2)).toSeq ===
      Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(out.map(_.getInt(3)).toSeq === Seq(4, 4, 4))
    // tokens past the overlap are covered exactly once per window step
    val covered = out.flatMap(_.getString(2).split(" ")).toSet
    assert(covered === (1 to 10).map(i => s"t$i").toSet)
  }

  test("tokenChunks: doc shorter than one chunk yields a single short chunk") {
    val out = TextAnalysis.tokenChunks(docs(1L -> "a b c"), "doc_id", "text",
      chunkSize = 32, stride = 24).collect()
    assert(out.length === 1)
    assert(out.head.getString(2) === "a b c" && out.head.getInt(3) === 3)
    // blank and null docs yield nothing
    assert(TextAnalysis.tokenChunks(docs(2L -> "   "), "doc_id", "text", 4, 4)
      .count() === 0)
    assert(TextAnalysis.tokenChunks(
      Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", 4, 4).count() === 0)
  }

  test("tokenChunks: exact-boundary doc emits no redundant tail chunk") {
    // 8 tokens, size 4, stride 4 -> exactly 2 chunks, no empty third
    val out = TextAnalysis.tokenChunks(docs(1L -> "a b c d e f g h"),
      "doc_id", "text", 4, 4).collect()
    assert(out.length === 2)
    assert(out.map(_.getInt(3)).toSeq === Seq(4, 4))
  }

  test("repetitionStats matches hand computation") {
    // "x x y x": 4 tokens, 2 distinct -> dup_word_frac = 0.5
    // bigrams: "x x", "x y", "y x" -> all count 1 -> top frac 1/3 = 0.3333
    val out = TextAnalysis.repetitionStats(docs(1L -> "x x y x"),
      "doc_id", "text", n = 2).collect().head
    assert(out.getDouble(1) === 0.5)
    assert(out.getDouble(2) === 0.3333)
    // "a a a a": dup 0.75, bigram "a a" x3 -> top frac 1.0
    val rep = TextAnalysis.repetitionStats(docs(2L -> "a a a a"),
      "doc_id", "text", n = 2).collect().head
    assert(rep.getDouble(1) === 0.75 && rep.getDouble(2) === 1.0)
    // single-token doc is out of domain (no bigram exists)
    assert(TextAnalysis.repetitionStats(docs(3L -> "solo"), "doc_id", "text")
      .count() === 0)
  }

  test("dropBoilerplate drops frequent units, reassembles in order") {
    // "nav" appears 3x corpus-wide (> maxCount 2) -> every copy dropped;
    // "footer" appears 2x (<= 2) -> kept
    val d = docs(
      1L -> "nav\nreal one\nfooter",
      2L -> "nav\nreal two",
      3L -> "nav\nfooter\nreal three")
    val out = TextAnalysis.dropBoilerplate(d, "doc_id", "text", maxCount = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq(
      (1L, "real one\nfooter", 1L, 3L),
      (2L, "real two", 1L, 2L),
      (3L, "footer\nreal three", 1L, 3L)))
    // a doc that is ALL boilerplate stays, with empty clean_text
    val all = TextAnalysis.dropBoilerplate(docs(1L -> "x\nx", 2L -> "x"),
      "doc_id", "text", maxCount = 2).orderBy("doc_id").collect()
    assert(all.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      === Seq((1L, "", 2L), (2L, "", 1L)))
    // span units: same op over 2-token spans for line-free corpora
    val sp = TextAnalysis.dropBoilerplate(
      docs(1L -> "a b c d", 2L -> "a b x", 3L -> "a b"),
      "doc_id", "text", maxCount = 2,
      splitUnits = t => TextAnalysis.tokenSpans(t, 2), sep = " ")
      .orderBy("doc_id").collect()
    // "a b" occurs 3x (> 2) -> dropped everywhere; tails survive
    assert(sp.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "c d"), (2L, "x"), (3L, "")))
  }

  test("dropBoilerplate plan: frequent set broadcasts, corpus side unshuffled pre-join") {
    val plan = TextAnalysis.dropBoilerplate(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
      maxCount = 20, splitUnits = t => TextAnalysis.tokenSpans(t, 2),
      sep = " ").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"frequent-unit set must broadcast:\n$plan")
  }

  test("repetitionStats plans as a shuffle-free narrow scan") {
    val plan = TextAnalysis.repetitionStats(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", n = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetition signals must not shuffle:\n$plan")
  }

  test("tfidfTopTerms scores and ranks by log-free idf") {
    // d1: "a a b", d2: "b c" ; N = 2
    // df: a->1, b->2, c->1 ; idf: a,c -> 3/2 = 1.5 ; b -> 1.0
    // d1: a = 2*1.5 = 3.0, b = 1*1.0 = 1.0 ; d2: c = 1.5, b = 1.0
    val out = TextAnalysis.tfidfTopTerms(
      docs(1L -> "a a b", 2L -> "b c"), "doc_id", "text", k = 1)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      === Seq((1L, "a", 3.0), (2L, "c", 1.5)))
    // k=2 keeps both terms of d2, tie-free
    assert(TextAnalysis.tfidfTopTerms(docs(1L -> "a a b", 2L -> "b c"),
      "doc_id", "text", k = 2).count() === 4)
  }

  test("tfidfTopTerms: web-vocab mode drops the forced broadcast, same result") {
    val in = docs(1L -> "a a b", 2L -> "b c")
    val forced = TextAnalysis.tfidfTopTerms(in, "doc_id", "text", k = 2)
    val planned = TextAnalysis.tfidfTopTerms(in, "doc_id", "text", k = 2,
      broadcastVocab = false)
    assert(planned.orderBy("doc_id", "word").collect().toSeq
      === forced.orderBy("doc_id", "word").collect().toSeq)
    // only the 1-row corpus count keeps a broadcast HINT; the
    // vocabulary join strategy is left to the planner (shuffle join at
    // web-scale stats, AQE may still demote to broadcast when small)
    def hints(df: org.apache.spark.sql.DataFrame): Int =
      "ResolvedHint".r.findAllIn(df.queryExecution.analyzed.toString).length
    assert(hints(forced) >= 2 && hints(planned) === hints(forced) - 1)
  }

  test("decontamination: hits count distinct benchmark grams; clean drops") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog", // contains bench gram
      2L -> "completely unrelated training material here",
      3L -> "quick brown fox again and brown fox jumps too")
    val bench = docs(100L -> "quick brown fox", 101L -> "brown fox jumps")
    val hits = Decontaminate.contaminationHits(corpus, "doc_id", "text",
      bench, "text", n = 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 contains both benchmark 3-grams; doc 3 contains both; doc 2 none
    assert(hits === Map(1L -> 2L, 3L -> 2L))
    val cleaned = Decontaminate.clean(corpus, "doc_id", "text", bench, "text",
      n = 3, minHits = 1).select("doc_id").as[Long].collect().toSet
    assert(cleaned === Set(2L))
    // minHits above the evidence keeps everything
    assert(Decontaminate.clean(corpus, "doc_id", "text", bench, "text",
      n = 3, minHits = 3).count() === 3)
  }

  test("bigram LM score: hand-computed smoothed probabilities") {
    // corpus: unigrams a:3 b:3 c:1 (V=3); bigrams "a b":3, "b a":1
    // α=0.1 → p(a b)=3.1/3.3, p(b a)=1.1/3.3; blank doc out of domain,
    // single-token doc trains unigrams but scores nothing
    val corpus = docs(1L -> "a b a b", 2L -> "a b", 3L -> "c", 4L -> "  ")
    val got = TextAnalysis.lmScore(corpus, "doc_id", "text", alpha = 0.1)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getDouble(1))
    val pAB = 3.1 / 3.3; val pBA = 1.1 / 3.3
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(got.toSeq === Seq(
      1L -> r4((pAB + pBA + pAB) / 3.0), // 0.7374
      2L -> r4(pAB)))                    // 0.9394
    // log-space variant: avg ln p
    val lg = TextAnalysis.lmScore(corpus, "doc_id", "text", alpha = 0.1,
      logSpace = true).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(lg.toSeq === Seq(
      1L -> r4((2 * math.log(pAB) + math.log(pBA)) / 3.0),
      2L -> r4(math.log(pAB))))
    // in-domain text scores above noise on the real corpus
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val scored = TextAnalysis.lmScore(d, "doc_id", "text")
    assert(scored.agg(min("lm_score"), max("lm_score")).head().getDouble(1) <= 1.0)
    assert(scored.count() > 0)
  }

  test("bloom-prefiltered decontamination is exact: equals the semi-join path") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "completely unrelated training material here",
      3L -> "quick brown fox again and brown fox jumps too")
    val bench = docs(100L -> "quick brown fox", 101L -> "brown fox jumps")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = asMap(Decontaminate.contaminationHits(
      corpus, "doc_id", "text", bench, "text", n = 3))
    // a sloppy filter (high fpp) must still give the exact answer — the
    // verify join, not the bloom filter, decides membership
    Seq(0.5, 0.01).foreach { fpp =>
      val got = asMap(Decontaminate.contaminationHitsBloom(
        corpus, "doc_id", "text", bench, "text", n = 3, fpp = fpp))
      assert(got === exact, s"fpp=$fpp")
    }
    // sf-corpus scale: both paths agree end-to-end
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val big = asMap(Decontaminate.contaminationHits(
      d.filter($"doc_id" % 97 =!= 0), "doc_id", "text",
      d.filter($"doc_id" % 97 === 0), "text", n = 3))
    val bigBloom = asMap(Decontaminate.contaminationHitsBloom(
      d.filter($"doc_id" % 97 =!= 0), "doc_id", "text",
      d.filter($"doc_id" % 97 === 0), "text", n = 3))
    assert(bigBloom === big)
  }

  test("duplicated spans: cross-doc and within-doc repeats, short docs absent") {
    val corpus = docs(
      1L -> "one two three four five six seven eight nine ten",
      2L -> "zzz one two three four five six seven eight yyy",
      3L -> "a b a b a b a b a b a b a b a b a b",
      4L -> "too short")
    val got = graft.textanalysis.TextAnalysis
      .duplicatedSpans(corpus, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 1+2 share exactly the span "one two three four five six seven
    // eight" (positions 1 in doc1, 2 in doc2); their other spans are unique
    assert(got(1L) === ((3L, 1L, 0.333)))
    assert(got(2L) === ((3L, 1L, 0.333)))
    // doc 3: every 8-gram of the ab-cycle repeats WITHIN the doc
    assert(got(3L)._1 === 11L && got(3L)._2 === 11L && got(3L)._3 === 1.0)
    // doc 4 has fewer than n words: absent from the report
    assert(!got.contains(4L))
  }

  test("bloom probe is a codegen expression inside the scan stage") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val df = Decontaminate.contaminationHitsBloom(
      d.filter($"doc_id" % 97 =!= 0), "doc_id", "text",
      d.filter($"doc_id" % 97 === 0), "text", n = 3)
    df.collect() // finalize the AQE plan so codegen stages are visible
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF")
      && !plan.toLowerCase.contains("pythonudf"),
      s"no UDF in the prefilter stage:\n$plan")
    assert(plan.contains("bloom_might_contain"),
      s"the codegen probe must appear in the plan:\n$plan")
    // the '*(n)' prefix is the whole-stage-codegen marker; the Filter
    // carrying the probe must sit inside a starred stage
    val probeLine = plan.linesIterator
      .find(l => l.contains("Filter") && l.contains("bloom_might_contain"))
    assert(probeLine.exists(_.contains("*(")),
      s"prefilter stays inside whole-stage codegen:\n$plan")
  }

  test("bucketed prefix sum equals the single-window form, any bucket width") {
    import graft.operators.BucketedPrefixSum
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"n_chars")
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expected = d.withColumn("s", coalesce(sum("n_chars").over(w), lit(0L)))
      .orderBy("doc_id").select("doc_id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    Seq(1L, 7L, 100L, 1000000L).foreach { width =>
      val got = BucketedPrefixSum(d, "doc_id", "n_chars", "s", width)
        .orderBy("doc_id").select("doc_id", "s")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === expected, s"bucketWidth=$width")
    }
  }

  test("packSequences: exclusive offsets, boundary-spanning docs, exact cuts") {
    val d = docs(
      1L -> (1 to 6).map(_ => "w").mkString(" "),  // 6 tokens, start 0
      2L -> (1 to 3).map(_ => "w").mkString(" "),  // start 6 -> spans the cut
      3L -> "w",                                   // start 9
      4L -> (1 to 7).map(_ => "w").mkString(" "))  // start 10
    val out = TextAnalysis.packSequences(d, "doc_id", "text", budget = 8,
      bucketWidth = 2).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 6L, 0L, 0L),   // seq 0, offset 0
      (2L, 3L, 0L, 6L),   // starts in seq 0 at offset 6, spans into seq 1
      (3L, 1L, 1L, 1L),   // seq 1 (tokens 9..9)
      (4L, 7L, 1L, 2L)))  // seq 1 offset 2
    // total token count is conserved: last start + last n = sum of tokens
    assert(out.last._3 * 8 + out.last._4 + out.last._2 === 17L)
  }

  test("weighted hash sample: deterministic, weight-proportional, clamped") {
    import graft.operators.{Md5, WeightedHashSample, Xx64}
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val n = li.count().toDouble
    // constant weight w behaves like HashSample(w)
    Seq(0.25, 0.75).foreach { w =>
      val k = WeightedHashSample(li, lit(w), Seq("l_orderkey", "l_linenumber",
        "l_partkey", "l_suppkey")).count().toDouble
      assert(math.abs(k / n - w) < 0.05, s"w=$w kept ${k / n}")
    }
    // weight 0 keeps nothing; weight 1 keeps (essentially) everything;
    // out-of-range weights clamp rather than misbehave
    assert(WeightedHashSample(li, lit(0.0), Seq("l_orderkey")).count() === 0)
    assert(WeightedHashSample(li, lit(1.0), Seq("l_orderkey", "l_linenumber",
      "l_partkey", "l_suppkey")).count() === n.toLong)
    assert(WeightedHashSample(li, lit(-3.0), Seq("l_orderkey")).count() === 0)
    assert(WeightedHashSample(li, lit(7.0), Seq("l_orderkey", "l_linenumber",
      "l_partkey", "l_suppkey")).count() === n.toLong)
    // per-row weights: re-evaluation and repartitioning keep the same set
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("w", graft.textanalysis.TextAnalysis.qualityScore($"text"))
    def kept(df: org.apache.spark.sql.DataFrame, h: graft.operators.SampleHash) =
      WeightedHashSample(df, col("w"), Seq("doc_id"), h)
        .select("doc_id").as[Long].collect().sorted.toSeq
    Seq(Xx64, Md5).foreach { h =>
      val s1 = kept(d, h)
      assert(s1.nonEmpty && s1.length < d.count())
      assert(kept(d.repartition(13), h) === s1, s"hash=$h")
    }
    // zero shuffle: a pure filter over the scan
    val p = WeightedHashSample(d, col("w"), Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"weighted sample must not shuffle:\n$p")
  }

  test("redaction: ordered rules, hit counts, idempotence") {
    import graft.textanalysis.Redact
    val d = Seq((1L, "mail bob.jones+x@corp.example.com port 8080 ip 10.0.0.1"),
      (2L, "no sensitive spans here"))
      .toDF("id", "text")
    val out = d.select($"id",
      Redact.hitCount($"text", Redact.Email).as("emails"),
      Redact.hitCount($"text", Redact.Ipv4).as("ips"),
      Redact.redactAll($"text", Seq(
        Redact.Email -> "<EMAIL>", Redact.Ipv4 -> "<IP>",
        Redact.DigitRun -> "<NUM>")).as("red"))
      .orderBy("id").collect()
    assert(out(0).getInt(1) === 1 && out(0).getInt(2) === 1)
    assert(out(0).getString(3) === "mail <EMAIL> port <NUM> ip <IP>")
    assert(out(1).getString(3) === "no sensitive spans here")
    // idempotent: redacting already-redacted text changes nothing
    val once = Redact.redactAll($"text", Seq(Redact.Email -> "<EMAIL>"))
    val twice = Redact.redactAll(once, Seq(Redact.Email -> "<EMAIL>"))
    assert(d.select((once === twice).as("eq")).collect().forall(_.getBoolean(0)))
  }

  test("decontamination plan: benchmark side broadcasts, corpus side has no pre-join shuffle") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val hits = Decontaminate.contaminationHits(
      d.filter($"doc_id" % 97 =!= 0), "doc_id", "text",
      d.filter($"doc_id" % 97 === 0), "text", n = 3)
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // the corpus (streamed) side must reach the join shuffle-free: in the
    // plan text that subtree sits between the BroadcastHashJoin line and
    // its build-side BroadcastExchange, and may contain no hash Exchange
    // (the remaining exchanges are the tiny benchmark distinct inside the
    // broadcast build and the post-join hit aggregation)
    val streamed = plan.substring(plan.indexOf("BroadcastHashJoin"),
      plan.indexOf("BroadcastExchange"))
    assert(!streamed.contains("Exchange hashpartitioning"),
      s"corpus side must not shuffle before the match:\n$streamed")
  }
}
