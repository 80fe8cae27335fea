package graft

import org.apache.spark.sql.functions._
import graft.graph.PageRank
import graft.operators.{Analytics, FuzzyJoin, WeightedTopKSample}
import graft.textanalysis.TextAnalysis

/** Behavioral + plan-shape specs for the round-7 analytics batch (the
  * DuckDB gates check cross-engine values; these pin semantics and the
  * scale-critical plan shapes). */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val events = queries.tbl(spark, sf, "events")
  private lazy val orders = queries.tbl(spark, sf, "orders")

  // ---------------- salted aggregation ----------------

  test("saltedStats equals the direct groupBy, any salt count") {
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        min("value").as("v_min"), max("value").as("v_max"),
        round(sum("value"), 2).as("v_sum"),
        round(sum("value") / count(lit(1)), 2).as("v_avg"))
      .orderBy("event_type")
      .select("event_type", "n", "v_min", "v_max", "v_sum", "v_avg")
    Seq(1, 4, 32).foreach { salts =>
      val got = Analytics.saltedStats(events, Seq("event_type"), "value",
          Seq("event_id"), salts)
        .orderBy("event_type")
        .select("event_type", "n", "v_min", "v_max", "v_sum", "v_avg")
      assert(got.collect().toSeq === direct.collect().toSeq,
        s"salted ($salts lanes) must be row-identical to direct groupBy")
    }
  }

  test("saltedStats plans two aggregation stages over a hash salt") {
    val p = Analytics.saltedStats(events, Seq("event_type"), "value",
      Seq("event_id"), 16).queryExecution.executedPlan.toString
    assert(p.contains("xxhash64"), "salt must be a deterministic hash")
    // partial lane agg shuffles on (key, salt), merge shuffles on key:
    // exactly two exchanges, both hash partitionings
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 2, s"expected 2 hash exchanges, plan:\n$p")
  }

  // ---------------- per-group top-k ----------------

  test("salted top-k per group equals the single-window form") {
    val plain = Analytics.topKPerGroup(orders, Seq("o_orderstatus"),
      "o_totalprice", 5, Seq("o_orderkey"))
      .select("o_orderstatus", "o_orderkey", "rk")
      .orderBy("o_orderstatus", "rk").collect()
    Seq(2, 8).foreach { salts =>
      val salted = Analytics.topKPerGroup(orders, Seq("o_orderstatus"),
        "o_totalprice", 5, Seq("o_orderkey"), salts)
        .select("o_orderstatus", "o_orderkey", "rk")
        .orderBy("o_orderstatus", "rk").collect()
      assert(salted.toSeq === plain.toSeq)
    }
  }

  test("top-k tie-break is deterministic (ascending tie columns)") {
    val df = Seq(("g", 1L, 10.0), ("g", 3L, 10.0), ("g", 2L, 10.0))
      .toDF("grp", "id", "v")
    val got = Analytics.topKPerGroup(df, Seq("grp"), "v", 2, Seq("id"))
      .select("id", "rk").orderBy("rk").as[(Long, Int)].collect()
    assert(got.toSeq === Seq((1L, 1), (2L, 2)),
      "equal values must rank by ascending id")
  }

  // ---------------- per-group mode ----------------

  test("mode ties resolve to the smallest value") {
    val df = Seq(("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"))
      .toDF("grp", "v")
    val got = Analytics.modePerGroup(df, Seq("grp"), "v")
      .select("mode_value", "mode_count").as[(String, Long)].collect()
    assert(got.toSeq === Seq(("a", 2L)))
  }

  test("mode's rank window runs over the counted table, not raw rows") {
    val plan = Analytics.modePerGroup(orders, Seq("o_orderstatus"),
      "o_orderpriority").queryExecution.executedPlan.toString
    // the aggregate must appear BELOW the window in the plan tree
    val aggIdx = plan.indexOf("HashAggregate")
    val winIdx = plan.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < aggIdx,
      s"window must consume the aggregated counts:\n$plan")
  }

  // ---------------- funnel ----------------

  test("funnel counts only in-order step completions (greedy match)") {
    // u1 completes view->click->purchase in order; u2's click precedes
    // its view so it stalls at step 1; u3 views and clicks, no purchase
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 10L), (2L, "view", 20L), (2L, "purchase", 30L),
      (3L, "view", 10L), (3L, "click", 15L))
      .toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .select("step", "n_users").as[(String, Long)].collect()
    // u2 stalls at view (its click precedes the view); u3's click counts
    // but it never purchases; u2's purchase can't count without a click
    assert(got.toSeq === Seq(("view", 3L), ("click", 2L), ("purchase", 1L)))
  }

  test("funnel emits a zero row for unreached steps") {
    val ev = Seq((1L, "view", 10L)).toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click")).orderBy("step_idx")
      .select("n_users").as[Long].collect()
    assert(got.toSeq === Seq(1L, 0L))
  }

  // ---------------- cohort retention ----------------

  test("cohort retention grid from crafted weeks") {
    // u1 first week 100, active 100+101; u2 first 100, active 100+102;
    // u3 first 101, active 101 only
    val ev = Seq((1L, 100L), (1L, 101L), (2L, 100L), (2L, 102L),
      (2L, 100L), (3L, 101L)).toDF("user_id", "w")
    val got = Analytics.cohortRetention(ev, "user_id", col("w"))
      .orderBy("cohort_week", "week_offset")
      .select("cohort_week", "week_offset", "n_users")
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((100L, 0L, 2L), (100L, 1L, 1L),
      (100L, 2L, 1L), (101L, 0L, 1L)))
  }

  // ---------------- quantile buckets ----------------

  test("decile buckets cover min..max and partition the table") {
    val cuts = Analytics.quantileCutpoints(orders, "o_totalprice",
      (1 to 9).map(_ / 10.0))
    val bucketed = Analytics.bucketByCutpoints(orders, "o_totalprice", cuts)
      .cache()
    try {
      assert(bucketed.count() === orders.count(), "every row gets a bucket")
      val range = bucketed.agg(min("bucket"), max("bucket"))
        .as[(Int, Int)].head()
      assert(range === ((1, 10)))
      // exact deciles: no bucket holds more than ~2x its fair share
      val maxShare = bucketed.groupBy("bucket").count()
        .agg(max("count")).as[Long].head()
      assert(maxShare <= orders.count() / 5,
        "buckets should be near-uniform for a continuous value")
    } finally bucketed.unpersist()
  }

  test("bucket assignment broadcasts the 1-row cutpoint frame") {
    val cuts = Analytics.quantileCutpoints(orders, "o_totalprice",
      Seq(0.5))
    val p = Analytics.bucketByCutpoints(orders, "o_totalprice", cuts)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"cutpoints must broadcast, not shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"), "no shuffle join for a 1-row frame")
  }

  // ---------------- histogram ----------------

  test("histogram bins reconcile with the direct computation") {
    val h = Analytics.histogram(orders, "o_totalprice", 0.0, 50000.0)
    val total = h.agg(sum("n")).as[Long].head()
    assert(total === orders.count())
    val direct = orders
      .withColumn("bin", floor(col("o_totalprice") / 50000.0).cast("long"))
      .groupBy("bin").count().orderBy("bin")
      .as[(Long, Long)].collect()
    val got = h.orderBy("bin").select("bin", "n").as[(Long, Long)].collect()
    assert(got.toSeq === direct.toSeq)
  }

  test("count-min estimates upper-bound every true count") {
    val sketch = Analytics.cmsSketch(events, "user_id", depth = 4, width = 512)
    assert(sketch.count() <= 4L * 512)
    val probes = events.select("user_id").distinct()
    val est = Analytics.cmsEstimate(sketch, probes, "user_id", 4, 512)
    val tru = events.groupBy("user_id").agg(count(lit(1)).as("true_cnt"))
    val bad = est.join(tru, Seq("user_id"))
      .filter(col("cms_est") < col("true_cnt")).count()
    assert(bad === 0L, "CMS must never underestimate")
  }

  test("count-min sketches of disjoint shards merge by cell addition") {
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 === 1)
    val merged = Analytics.cmsSketch(a, "user_id", 4, 512)
      .unionByName(Analytics.cmsSketch(b, "user_id", 4, 512))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val full = Analytics.cmsSketch(events, "user_id", 4, 512)
    assert(merged.exceptAll(full).count() === 0L)
    assert(full.exceptAll(merged).count() === 0L)
  }

  test("cms join-size estimate upper-bounds the true join cardinality") {
    val a = events.filter(col("event_type") === "click")
    val b = events.filter(col("event_type") === "purchase")
    val est = Analytics.cmsJoinSizeEstimate(
        Analytics.cmsSketch(a, "user_id", 4, 512),
        Analytics.cmsSketch(b, "user_id", 4, 512))
      .head().getLong(0)
    val tru = a.groupBy("user_id").agg(count(lit(1)).as("na"))
      .join(b.groupBy("user_id").agg(count(lit(1)).as("nb")), Seq("user_id"))
      .agg(sum(col("na") * col("nb"))).head().getLong(0)
    assert(est >= tru, s"CMS inner product must never underestimate")
    val slack = 8.0 * a.count() * b.count() / 512.0
    assert(est - tru <= slack, s"est $est vs true $tru: slack over $slack")
  }

  test("histogram percentiles land within one bin width of exact") {
    val ps = Seq(0.5, 0.9, 0.95, 0.99)
    val got = Analytics.histogramPercentiles(events, "value",
        lo = 0.0, width = 5.0, nBins = 100, ps = ps)
      .orderBy("p").as[(Double, Double)].collect()
    assert(got.map(_._1).toSeq === ps)
    // monotone in p
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
    val exact = events.select(
      ps.map(p => percentile(col("value"), lit(p))): _*).head()
    ps.indices.foreach { i =>
      assert(math.abs(got(i)._2 - exact.getDouble(i)) <= 5.0,
        s"p=${ps(i)}: est ${got(i)._2} vs exact ${exact.getDouble(i)}")
    }
  }

  test("hll registers stay under 2^p and merge by per-bucket max") {
    val p = 10
    val full = Analytics.hllRegisters(events, "event_id", p)
    assert(full.count() <= (1L << p))
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 === 1)
    val merged = Analytics.hllRegisters(a, "event_id", p)
      .unionByName(Analytics.hllRegisters(b, "event_id", p))
      .groupBy("bucket").agg(max("m_reg").as("m_reg"))
    assert(merged.exceptAll(full).count() === 0L)
    assert(full.exceptAll(merged).count() === 0L)
  }

  test("hll estimate lands within 5% of the true cardinality") {
    Seq("event_id", "user_id").foreach { k =>
      val est = Analytics.hllEstimate(
        Analytics.hllRegisters(events, k, 12), 12)
        .head().getDouble(0)
      val tru = events.select(countDistinct(col(k))).head().getLong(0)
      assert(math.abs(est - tru) <= 0.05 * tru + 1,
        s"$k: est $est vs true $tru")
    }
  }

  test("grouped hll registers equal per-group ungrouped registers") {
    val grouped = Analytics.hllRegistersGrouped(events, Seq("event_type"),
        "user_id", 10)
      .filter(col("event_type") === "click").drop("event_type")
    val single = Analytics.hllRegisters(
      events.filter(col("event_type") === "click"), "user_id", 10)
    assert(grouped.exceptAll(single).count() === 0L)
    assert(single.exceptAll(grouped).count() === 0L)
  }

  test("grouped hist percentiles equal the per-group ungrouped run") {
    val ps = Seq(0.5, 0.9)
    val grouped = Analytics.histogramPercentilesGrouped(events,
        "event_type", "value", 0.0, 5.0, 100, ps)
      .filter(col("event_type") === "view").select("p", "est")
    val single = Analytics.histogramPercentiles(
      events.filter(col("event_type") === "view"), "value",
      0.0, 5.0, 100, ps)
    assert(grouped.orderBy("p").collect().toSeq ===
      single.orderBy("p").collect().toSeq)
  }

  test("sketches run as streaming aggregations (complete-mode twins)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val data = (1L to 500L).map(i => i * i % 997)
    val (first, second) = data.splitAt(200)

    val cmsIn = MemoryStream[Long]
    val cmsQ = Analytics.cmsSketch(cmsIn.toDF().toDF("k"), "k", 4, 64)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_cms_twin").start()
    try {
      cmsIn.addData(first: _*)
      cmsQ.processAllAvailable()
      cmsIn.addData(second: _*) // state carries across micro-batches
      cmsQ.processAllAvailable()
      val streamed = spark.table("stream_cms_twin")
        .collect().map(_.toSeq).toSet
      val batch = Analytics.cmsSketch(data.toDF("k"), "k", 4, 64)
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally cmsQ.stop()

    val hllIn = MemoryStream[Long]
    val hllQ = Analytics.hllRegisters(hllIn.toDF().toDF("k"), "k", 8)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_hll_twin").start()
    try {
      hllIn.addData(first: _*)
      hllQ.processAllAvailable()
      hllIn.addData(second: _*)
      hllQ.processAllAvailable()
      val streamed = spark.table("stream_hll_twin")
        .collect().map(_.toSeq).toSet
      val batch = Analytics.hllRegisters(data.toDF("k"), "k", 8)
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally hllQ.stop()
  }

  // ---------------- char entropy ----------------

  test("char entropy unit values") {
    val df = Seq(
      ("aaaa", 0.0),        // single symbol: zero entropy
      ("ab", 0.6931),       // ln 2
      ("abab", 0.6931),     // same distribution, longer text
      ("", 0.0))            // blank guards to 0
      .toDF("text", "want")
    val got = df.select(TextAnalysis.charEntropy(col("text")).as("h"),
      col("want")).as[(Double, Double)].collect()
    got.foreach { case (h, want) => assert(h === want) }
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.charEntropy(col("text"))).as[Double].head()
    assert(nullRow === 0.0)
  }

  test("codegen entropy kernel equals the SQL-lambda form it replaced") {
    val docs = queries.tbl(spark, sf, "documents")
    val mismatch = docs.select(
        TextAnalysis.charEntropy(col("text")).as("a"),
        TextAnalysis.charEntropyLambda(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatch === 0)
    // and the interpreted eval path agrees with crafted values
    assert(graft.functions.CharEntropy.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab")) === 0.6931)
    assert(graft.functions.CharEntropy.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("")) === 0.0)
  }

  test("char entropy is a zero-shuffle map over the scan") {
    val docs = queries.tbl(spark, sf, "documents")
    val p = docs.select(col("doc_id"),
        TextAnalysis.charEntropy(col("text")).as("entropy"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"entropy must not shuffle:\n$p")
  }

  // ---------------- table checksum ----------------

  test("checksum is partitioning-invariant and change-sensitive") {
    val li = queries.tbl(spark, sf, "lineitem")
    val cols = Seq("l_orderkey", "l_linenumber", "l_quantity")
    val base = Analytics.tableChecksum(li, cols).head()
    val shuffled = Analytics.tableChecksum(li.repartition(13), cols).head()
    assert(base === shuffled, "row order/partitioning must not matter")
    // flip one value: count identical, both content channels move
    val victim = li.select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").head()
    val tampered = li.withColumn("l_quantity",
      when(col("l_orderkey") === victim.getLong(0) &&
        col("l_linenumber") === victim.getInt(1),
        col("l_quantity") + 1).otherwise(col("l_quantity")))
    val t = Analytics.tableChecksum(tampered, cols).head()
    assert(t.getLong(0) === base.getLong(0))
    assert(t.getLong(1) !== base.getLong(1))
    assert(t.getLong(2) !== base.getLong(2))
  }

  test("checksum distinguishes null patterns positionally") {
    // ('a', null, 'b') vs ('a', 'b', null): a bare concat_ws digest
    // collides these; the positional __NULL__ sentinel must not
    val x = Seq(("a", null: String, "b")).toDF("c1", "c2", "c3")
    val y = Seq(("a", "b", null: String)).toDF("c1", "c2", "c3")
    val cols = Seq("c1", "c2", "c3")
    val cx = Analytics.tableChecksum(x, cols).head()
    val cy = Analytics.tableChecksum(y, cols).head()
    assert(cx.getLong(1) !== cy.getLong(1),
      "null-pattern rows must digest differently")
    // and a null key still routes to a stable Merkle bucket
    val bx = Analytics.bucketChecksum(x, Seq("c2"), cols, 16).collect()
    assert(bx.length === 1 && bx(0).getLong(1) === 1L,
      s"null key must land in exactly one lane: ${bx.toSeq}")
  }

  // ---------------- as-of directions ----------------

  test("as-of knobs: strict exact matches and tolerance") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 100L), (1L, 200L)).toDF("k", "t")
    val r = Seq((1L, 100L, "x"), (1L, 90L, "a"), (1L, 199L, "b"))
      .toDF("k", "rt", "p")
    def run(tol: Option[Long], exact: Boolean) =
      AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("p"),
        direction = AsOfJoin.Backward, tolerance = tol,
        allowExactMatches = exact)
        .orderBy("t").select("p").collect().map(r =>
          Option(r.getString(0))).toSeq
    // default: the equal-time right matches
    assert(run(None, exact = true) === Seq(Some("x"), Some("b")))
    // strict: t=100 skips x(100) back to a(90)
    assert(run(None, exact = false) === Seq(Some("a"), Some("b")))
    // strict + tolerance 5: a is 10 away -> dropped; b is 1 away -> kept
    assert(run(Some(5L), exact = false) === Seq(None, Some("b")))
    // forward strict: t=100 skips x(100), next is b(199)
    val fwd = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("p"),
      direction = AsOfJoin.Forward, allowExactMatches = false)
      .orderBy("t").select("p").collect().map(r => r.getString(0)).toSeq
    assert(fwd === Seq("b", null))
    // nearest strict + tolerance: t=100 candidates a(10 back) b(99 fwd)
    // -> a; with tolerance 5 both drop
    val near = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("p"),
      direction = AsOfJoin.Nearest, allowExactMatches = false)
      .orderBy("t").select("p").collect().map(r => r.getString(0)).toSeq
    assert(near === Seq("a", "b"))
    val nearTol = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("p"),
      direction = AsOfJoin.Nearest, tolerance = Some(5L),
      allowExactMatches = false)
      .orderBy("t").select("p").collect().map(r => r.getString(0)).toSeq
    assert(nearTol === Seq(null, "b"))
  }

  test("as-of directions: backward/forward/nearest on crafted times") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 100L), (1L, 200L), (2L, 50L)).toDF("k", "t")
    val r = Seq((1L, 90L, "a"), (1L, 103L, "b"), (1L, 250L, "c"),
      (2L, 400L, "d")).toDF("k", "rt", "p")
    def run(d: AsOfJoin.Direction) =
      AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("p"), direction = d)
        .orderBy("k", "t").select("p").as[Option[String]].collect().toSeq
    // t=100: prior a(90), next b(103), nearest b (3 < 10)
    // t=200: prior b(103), next c(250), nearest c (50 < 97)
    // t=50 (k=2): no prior -> null; next/nearest d(400)
    assert(run(AsOfJoin.Backward) === Seq(Some("a"), Some("b"), None))
    assert(run(AsOfJoin.Forward) === Seq(Some("b"), Some("c"), Some("d")))
    assert(run(AsOfJoin.Nearest) === Seq(Some("b"), Some("c"), Some("d")))
    // exact tie resolves backward: right at 150 and 250 around t=200
    val r2 = Seq((1L, 150L, "x"), (1L, 250L, "y")).toDF("k", "rt", "p")
    val tie = AsOfJoin(l.filter(col("t") === 200), r2, Seq("k"), "t", "rt",
      Seq("p"), direction = AsOfJoin.Nearest)
      .select("p").as[String].head()
    assert(tie === "x")
  }

  // ---------------- fuzzy join ----------------

  test("fuzzy join finds token-blocked near-matches with exact distances") {
    val df = Seq("red widget", "red gadget", "blue widget", "blue gadget",
      "green thing").toDF("name")
    val got = FuzzyJoin.selfPairs(df, "name", maxDist = 2)
      .orderBy("a_name", "b_name")
      .select("a_name", "b_name", "dist")
      .as[(String, String, Int)].collect()
    // within-color pairs share the color token, dist 2 (gadget/widget);
    // cross-color pairs share widget/gadget but lev("blue","red") = 4;
    // "green thing" shares no token with anything -> never a candidate
    assert(got.toSeq === Seq(
      ("blue gadget", "blue widget", 2), ("red gadget", "red widget", 2)))
  }

  test("fuzzy join stop-token cap drops hot-block pairs, pinned trade") {
    // every name shares "acme"; the second tokens are pairwise distinct,
    // so "acme" is the ONLY block key for the two dist-1 pairs
    val df = Seq("acme cat", "acme car", "acme dog", "acme dot")
      .toDF("name")
    val uncapped = FuzzyJoin.selfPairs(df, "name", maxDist = 1)
      .select("a_name", "b_name").as[(String, String)].collect().toSet
    assert(uncapped === Set(("acme car", "acme cat"),
      ("acme dog", "acme dot")))
    // capping acme's df removes the hot block entirely — the documented
    // recall trade for tokens whose block would go quadratic
    val capped = FuzzyJoin.selfPairs(df, "name", maxDist = 1,
      maxTokenDf = Some(3))
    assert(capped.count() === 0)
  }

  test("fuzzy join blocking really restricts candidates (no cross join)") {
    val df = Seq("red widget", "blue gadget").toDF("name")
    val p = FuzzyJoin.selfPairs(df, "name", maxDist = 100)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"block join must stay an equi-join:\n$p")
    // and no shared token -> no pair, even at a huge distance budget
    assert(FuzzyJoin.selfPairs(df, "name", maxDist = 100).count() === 0)
  }

  test("entity resolution merges transitive fuzzy chains") {
    // chain: "red cat" -1- "red car" -1- "rad car"; "blue dog" isolated
    val df = Seq((10L, "red cat"), (20L, "red car"), (30L, "rad car"),
      (40L, "blue dog"), (50L, "red cat")) // duplicate key keeps min id
      .toDF("id", "name")
    val got = FuzzyJoin.entityClusters(df, "name", "id", maxDist = 1)
      .orderBy("name")
      .select("name", "name_id", "entity_id", "canonical")
      .as[(String, Long, Long, String)].collect()
    assert(got.toSeq === Seq(
      ("blue dog", 40L, 40L, "blue dog"),
      ("rad car", 30L, 10L, "red cat"),
      ("red car", 20L, 10L, "red cat"),
      ("red cat", 10L, 10L, "red cat")))
  }

  // ---------------- z-score / MAD ----------------

  test("zscore outliers match the direct computation") {
    val direct = {
      val s = events.groupBy("event_type")
        .agg(avg("value").as("m"), stddev_samp("value").as("sd"))
      events.join(s, "event_type")
        .withColumn("z", round((col("value") - col("m")) / col("sd"), 4))
        .filter(abs(col("z")) >= 2.5)
        .select("event_id", "z").orderBy("event_id")
        .as[(Long, Double)].collect()
    }
    val got = Analytics.zscoreOutliers(events, Seq("event_type"), "value",
      2.5).select("event_id", "z").orderBy("event_id")
      .as[(Long, Double)].collect()
    assert(got.toSeq === direct.toSeq && got.nonEmpty)
  }

  test("MAD on crafted values") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0),
      ("g", 100.0)).toDF("grp", "v")
    val got = Analytics.madStats(df, Seq("grp"), "v")
      .select("med", "mad").as[(Double, Double)].head()
    assert(got === ((3.0, 1.0))) // deviations [2,1,0,1,97] -> median 1
  }

  // ---------------- trailing range window ----------------

  test("trailing range frame counts peers and respects the horizon") {
    val df = Seq((1L, 0L, 1.0), (1L, 1000L, 2.0), (1L, 1000L, 3.0),
      (1L, 5000L, 4.0)).toDF("u", "t", "v")
    val got = Analytics.trailingRangeAgg(df, Seq("u"), "t", 1000L, "v")
      .orderBy("t", "v").select("w_sum", "w_n")
      .as[(Double, Long)].collect()
    // t=0: itself; t=1000 (both peers): 1+2+3 within [0,1000];
    // t=5000: outside every earlier row's range
    assert(got.toSeq === Seq((1.0, 1L), (6.0, 3L), (6.0, 3L), (4.0, 1L)))
  }

  // ---------------- A-Res weighted sample ----------------

  test("A-Res sample: exact k, deterministic, scale-invariant weights") {
    val docs = queries.tbl(spark, sf, "documents")
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text"))
        .as("quality"))
    val s1 = WeightedTopKSample(docs, col("quality"), 50, Seq("doc_id"))
      .select("doc_id").as[Long].collect().sorted
    assert(s1.length === 50)
    val s2 = WeightedTopKSample(docs.repartition(7), col("quality"), 50,
      Seq("doc_id")).select("doc_id").as[Long].collect().sorted
    assert(s2.toSeq === s1.toSeq, "sample must not depend on partitioning")
    // key = ln(u)/w is order-invariant under weight scaling
    val s3 = WeightedTopKSample(docs, col("quality") * 7.0, 50,
      Seq("doc_id")).select("doc_id").as[Long].collect().sorted
    assert(s3.toSeq === s1.toSeq, "sample invariant under weight scaling")
  }

  test("stratified A-Res: exact quota per stratum, deterministic") {
    val docs = queries.tbl(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    val s1 = graft.operators.StratifiedWeightedTopKSample(docs,
      col("quality"), 10, Seq("lang"), Seq("doc_id"))
    val perStratum = s1.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    val available = docs.filter(col("quality") > 0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    available.foreach { case (lang, n) =>
      assert(perStratum(lang) === math.min(10L, n),
        s"stratum $lang must fill its quota")
    }
    val s2 = graft.operators.StratifiedWeightedTopKSample(docs.repartition(9),
      col("quality"), 10, Seq("lang"), Seq("doc_id"))
    assert(s2.select("doc_id").as[Long].collect().sorted.toSeq ===
      s1.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("containment detects a short doc quoted inside a long one") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "unrelated words entirely different content here"))
      .toDF("doc_id", "text")
    val got = graft.dedup.Dedup.containmentPairsWindowed(df, "doc_id",
      "text", window = 25, threshold = 0.9)
      .select("id_a", "id_b", "c_ab", "c_ba")
      .as[(Long, Long, Double, Double)].collect()
    // doc 1's 3 words all appear in doc 2 (10 words): c_ab = 1.0,
    // c_ba = 0.3; symmetric Jaccard would be 3/10 and miss it
    assert(got.toSeq === Seq((1L, 2L, 1.0, 0.3)))
  }

  test("A-Res sample excludes non-positive weights") {
    val df = Seq((1L, 0.0), (2L, -1.0), (3L, 0.5), (4L, 0.9))
      .toDF("id", "w")
    val got = WeightedTopKSample(df, col("w"), 10, Seq("id"))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === Seq(3L, 4L))
  }

  // ---------------- PageRank ----------------

  test("PageRank matches the hand-computed 2-iteration recurrence") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("s", "d")
    val got = PageRank(e, "s", "d", iterations = 2)
      .orderBy("node").select("node", "rank")
      .as[(String, Double)].collect().toMap
    // iter1: a=.15, b=.15+.85*.5=.575, c=.15+.85*1.5=1.425
    // iter2: a=.15, b=.15+.85*.075=.21375, c=.15+.85*(.075+.575)=.7025
    assert(got("a") === 0.15)
    assert(got("b") === 0.21375)
    assert(got("c") === 0.7025)
  }

  test("PageRank checkpointed run equals the unrolled plan") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")).toDF("s", "d")
    val plain = PageRank(e, "s", "d", iterations = 6)
      .orderBy("node").collect()
    val local = PageRank(e, "s", "d", iterations = 6, checkpointEvery = 2)
      .orderBy("node").collect()
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-ckpt")
    val reliable = PageRank(e, "s", "d", iterations = 6,
      checkpointEvery = 2, checkpointDir = Some(dir.toString))
      .orderBy("node").collect()
    assert(local.toSeq === plain.toSeq)
    assert(reliable.toSeq === plain.toSeq)
  }

  test("approx percentile sketch stays within its accuracy contract") {
    val o = orders.select(col("o_totalprice").as("v"))
    val (lo, hi) = (0.01, 0.99)
    val Seq(exactLo, exactHi) = o
      .agg(percentile(col("v"), lit(lo)), percentile(col("v"), lit(hi)))
      .head().toSeq.map(_.asInstanceOf[Double]).toSeq
    // accuracy 100 -> rank error <= n/100; verify via rank displacement
    val Seq(apLo, apHi) = o
      .agg(percentile_approx(col("v"), lit(lo), lit(100)),
        percentile_approx(col("v"), lit(hi), lit(100)))
      .head().toSeq.map(_.asInstanceOf[Double]).toSeq
    val n = o.count()
    def rankOf(x: Double): Long = o.filter(col("v") <= x).count()
    assert(math.abs(rankOf(apLo) - rankOf(exactLo)) <= n / 50,
      s"p01 sketch rank drift: approx=$apLo exact=$exactLo")
    assert(math.abs(rankOf(apHi) - rankOf(exactHi)) <= n / 50,
      s"p99 sketch rank drift: approx=$apHi exact=$exactHi")
  }

  test("ORC round-trips with predicate pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === orders.count())
    val q = back.filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_totalprice")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]"),
      s"ORC scan must push the predicate:\n$p")
    assert(q.count() ===
      orders.filter(col("o_orderstatus") === "F").count())
  }

  test("PageRank: every node floors at 1-d; sinks receive, never send") {
    val e = Seq(("a", "b"), ("b", "a"), ("c", "a")).toDF("s", "d")
    val got = PageRank(e, "s", "d", iterations = 3)
      .select("node", "rank").as[(String, Double)].collect().toMap
    assert(got.values.forall(_ >= 0.15 - 1e-9))
    assert(got("a") > got("c"), "a has in-links, c has none")
  }
}
