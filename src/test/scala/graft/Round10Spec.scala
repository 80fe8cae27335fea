package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.similarity.Similarity
import graft.textanalysis.{NaiveBayes, TextAnalysis}

/** Behavioral + plan-shape specs for the round-10 operators (the DuckDB
  * gates check cross-engine values; these pin semantics and the
  * scale-critical plan shapes). */
class Round10Spec extends SparkTestBase {
  import spark.implicits._

  private lazy val events = queries.tbl(spark, sf, "events")

  // ---------------- KMV bottom-k sketch ----------------

  test("kmv sketch merges: bottom-k of union == merge of sketches") {
    val a = events.where(col("event_type") === "click")
    val b = events.where(col("event_type") === "view")
    val k = 64
    val direct = Analytics.kmvSketch(a.unionByName(b), "event_id", k)
      .collect().map(_.getLong(0)).toSeq
    val merged = Analytics.kmvSketch(a, "event_id", k)
      .unionByName(Analytics.kmvSketch(b, "event_id", k))
      .distinct().orderBy("h").limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(direct === merged,
      "KMV must merge by union-then-keep-k-smallest")
  }

  test("kmv under-k path is the exact distinct count") {
    val est = Analytics.kmvEstimate(
      Analytics.kmvSketch(events, "user_id", 128), 128)
      .collect()(0).getDouble(0)
    val tru = events.agg(countDistinct("user_id")).collect()(0).getLong(0)
    assert(est === tru.toDouble,
      "fewer distincts than k: the sketch IS the set, estimate exact")
  }

  test("kmv estimator lands near the true cardinality over k") {
    val est = Analytics.kmvEstimate(
      Analytics.kmvSketch(events, "event_id", 128), 128)
      .collect()(0).getDouble(0)
    val tru = events.agg(countDistinct("event_id")).collect()(0).getLong(0)
    assert(math.abs(est - tru) / tru < 0.25,
      s"(k-1)/u_k estimate $est vs true $tru drifted past 25%")
  }

  test("kmv sketch plans a bounded top-k, never a global sort") {
    val p = Analytics.kmvSketch(events, "event_id", 128)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"ordered limit must plan as per-partition bottom-k:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"a KMV sketch must never range-shuffle the corpus:\n$p")
  }

  test("kmv sketch runs as a streaming aggregation (complete twin)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = (1L to 500L).map(i => i * i % 997)
    val (first, second) = data.splitAt(200)
    // the sketch STATE (distinct hashes) is the streamable aggregation;
    // bottom-k is the read path over it (limit is not a streaming op)
    val in = MemoryStream[Long]
    val q = Analytics.kmvHashes(in.toDF().toDF("k"), "k")
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_kmv_twin").start()
    try {
      in.addData(first: _*)
      q.processAllAvailable()
      in.addData(second: _*) // distinct-hash state carries across batches
      q.processAllAvailable()
      val streamed = spark.table("stream_kmv_twin")
        .orderBy("h").limit(64)
        .collect().map(_.getLong(0)).toSeq
      val batch = Analytics.kmvSketch(data.toDF("k"), "k", 64)
        .collect().map(_.getLong(0)).toSeq
      assert(streamed === batch,
        "bottom-k over the streamed state must equal the batch sketch")
    } finally q.stop()
  }

  // ---------------- reciprocal-rank fusion ----------------

  test("rrf fusion on crafted ranks: shared docs outrank single-list") {
    val sparse = Seq((10L, 1L), (11L, 2L), (12L, 3L))
      .toDF("doc_id", "rank")
    val dense = Seq((12L, 1L), (13L, 2L), (10L, 3L))
      .toDF("doc_id", "rank")
    val got = Similarity.rrfFuse(sparse, dense, "doc_id", c = 60, k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    // doc 10: 1/61 + 1/63; doc 12: 1/63 + 1/61 — tie, id asc;
    // doc 11: 1/62; doc 13: 1/62 — tie, id asc
    assert(got.map(_._1) === Seq(10L, 12L, 11L, 13L))
    assert(got(0)._2 === got(1)._2, "symmetric rank pairs must tie")
    val expect = math.rint((1.0 / 61 + 1.0 / 63) * 1e6) / 1e6
    assert(math.abs(got(0)._2 - expect) < 1e-9)
  }

  test("rrf keeps docs present in only one list (outer fusion)") {
    val sparse = Seq((1L, 1L)).toDF("doc_id", "rank")
    val dense = Seq((2L, 1L)).toDF("doc_id", "rank")
    val got = Similarity.rrfFuse(sparse, dense, "doc_id", c = 60, k = 10)
      .collect()
    assert(got.length === 2)
    assert(got.forall(r => r.isNullAt(1) ^ r.isNullAt(2)),
      "each doc must carry its one-sided rank with the other null")
  }

  test("rankByScore plans a bounded top-n before the rank window") {
    val scored = events.select(col("event_id"), col("value").as("s"))
    val p = Similarity.rankByScore(scored, "event_id", "s", 50)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"top-n must be a bounded buffer merge, not a global sort:\n$p")
  }

  // ---------------- truncated EWMA ----------------

  test("ewma on a crafted series matches the hand fold") {
    // alpha 0.5, span 3: weights 1, .5, .25 over the last 3 rows
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 40.0),
        (1L, 4L, 40.0))
      .toDF("k", "t", "v")
    val got = Analytics.ewma(df, Seq("k"), Seq("t"), "v",
        alpha = 0.5, span = 3)
      .orderBy("t").collect().map(_.getAs[Double]("ewma")).toSeq
    val expect = Seq(
      10.0,
      (20.0 + 10.0 * 0.5) / 1.5,
      (40.0 + 20.0 * 0.5 + 10.0 * 0.25) / 1.75,
      (40.0 + 40.0 * 0.5 + 20.0 * 0.25) / 1.75)
      .map(v => math.rint(v * 1e6) / 1e6)
    assert(got === expect)
  }

  test("ewma truncation: row 21 ignores row 1 entirely") {
    val rows = (1L to 21L).map(t => (1L, t, if (t == 1) 1e9 else 1.0))
    val df = rows.toDF("k", "t", "v")
    val last = Analytics.ewma(df, Seq("k"), Seq("t"), "v",
        alpha = 0.3, span = 20)
      .orderBy("t").collect().last.getAs[Double]("ewma")
    assert(last === 1.0, s"the spike outside the span must not leak: $last")
  }

  test("ewma is one window pass (span lags share the frame)") {
    val p = Analytics.ewma(events, Seq("user_id"), Seq("ts", "event_id"),
        "value", alpha = 0.3, span = 20)
      .queryExecution.executedPlan.toString
    assert(p.sliding("Window [".length).count(_ == "Window [") === 1,
      s"all lag terms must fold into one Window node:\n$p")
  }

  // ---------------- PSI drift ----------------

  test("psi is ~0 on identical versions, positive under a shift") {
    val base = queries.tbl(spark, sf, "orders")
      .select("o_custkey", "o_totalprice")
    val same = Analytics.driftPsi(base, base, "o_totalprice")
      .agg(sum(abs(col("psi")))).collect()(0).getDouble(0)
    assert(same < 1e-9, s"identical versions must score ~0 psi: $same")
    val shifted = base.select(
      (col("o_totalprice") * 1.5).as("o_totalprice"))
    val drift = Analytics.driftPsi(base, shifted, "o_totalprice")
      .agg(sum(col("psi"))).collect()(0).getDouble(0)
    assert(drift > 0.1, s"a 1.5x scale shift must register drift: $drift")
  }

  test("grouped psi isolates drift to the drifted group") {
    val base = events.select("event_type", "value")
    val current = base.select(col("event_type"),
      when(col("event_type") === "click", col("value") * 1.5)
        .otherwise(col("value")).as("value"))
    val perGroup = Analytics.driftPsiGrouped(base, current,
        "event_type", "value", nBuckets = 5)
      .groupBy("event_type").agg(sum(col("psi")).as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(perGroup("click") > 0.05,
      s"the drifted group must register: ${perGroup("click")}")
    assert(perGroup.filter(_._1 != "click").values.forall(_ < 0.01),
      s"undrifted groups must stay ~0: $perGroup")
  }

  test("grouped psi surfaces a group unseen in the baseline") {
    val base = events.select("event_type", "value")
    val current = base.unionByName(
      base.filter(col("event_type") === "click")
        .select(lit("brand_new").as("event_type"), col("value")))
    val rows = Analytics.driftPsiGrouped(base, current,
        "event_type", "value", nBuckets = 5)
      .filter(col("event_type") === "brand_new").collect()
    assert(rows.length === 1,
      s"one explicit row for the unseen segment: ${rows.toSeq}")
    val r = rows(0)
    assert(r.isNullAt(r.fieldIndex("bucket")),
      "an unbucketable new group carries a null bucket")
    assert(r.getDouble(r.fieldIndex("p_base")) === 0.0)
    assert(r.getDouble(r.fieldIndex("p_cur")) === 1.0,
      "the whole new segment is its own share")
    assert(r.isNullAt(r.fieldIndex("psi")),
      "psi is undefined against an empty baseline")
  }

  // ---------------- Hilbert curve ----------------

  test("hilbert distance walks the full grid in unit steps") {
    val bits = 3
    val n = 1 << bits
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x, y)))
      .toDF("x", "y")
    val got = grid.withColumn("d",
        graft.operators.ZOrder.hilbertD2(col("x"), col("y"), bits))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // d is a bijection onto [0, n^2)
    assert(got.map(_._3).sorted === (0L until (n.toLong * n)).toArray,
      "hilbert d must be a permutation of the grid")
    // CONSECUTIVE curve positions are grid neighbors — the locality
    // property Morton lacks (its jumps exceed 1 at power-of-two seams)
    val byD = got.sortBy(_._3)
    byD.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve step ($x1,$y1)->($x2,$y2) must be a unit move")
    }
  }

  test("native hilbert kernel is bit-identical to the chained build") {
    // full grid at bits=3 (the locality test already walks the native
    // path there) plus random 62-bit-safe coordinates at the largest
    // legal resolution — the native kernel must be indistinguishable
    // from the engine-agnostic chained-column reference at every level
    for (bits <- Seq(1, 2, 3, 4)) {
      val n = 1 << bits
      val grid = (0 until n).flatMap(x => (0 until n).map(y => (x, y)))
        .toDF("x", "y")
      val diff = grid.withColumn("dn",
          graft.operators.ZOrder.hilbertD2(col("x"), col("y"), bits))
        .withColumn("dc",
          graft.operators.ZOrder.hilbertD2Chained(col("x"), col("y"), bits))
        .where(col("dn") =!= col("dc")).count()
      assert(diff === 0L, s"native vs chained diverged at bits=$bits")
    }
    // random cells at bits=5 — past the exhaustive grids, still inside
    // the chained build's feasible range (its per-level coordinate
    // duplication grows analysis + generated code ~3-4x per bit, the
    // very defect the native kernel exists to remove: bits=8 already
    // blows the chained build past janino's limits)
    val bits = 5
    val rand = spark.range(2000).select(
      pmod(xxhash64(col("id")), lit(1L << bits)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1L << bits)).as("y"))
    val diff = rand.withColumn("dn",
        graft.operators.ZOrder.hilbertD2(col("x"), col("y"), bits))
      .withColumn("dc",
        graft.operators.ZOrder.hilbertD2Chained(col("x"), col("y"), bits))
      .where(col("dn") =!= col("dc")).count()
    assert(diff === 0L, "native vs chained diverged on random 5-bit cells")
    // the native kernel has no such limit: spot-check the long-capacity
    // edge (bits=31) against a driver-side replay of the same loop
    val edge = rand.withColumn("dn",
        graft.operators.ZOrder.hilbertD2(col("x"), col("y"), 31))
      .collect()
    edge.foreach { r =>
      assert(r.getLong(r.fieldIndex("dn")) ===
        graft.functions.HilbertD2.compute(r.getLong(0), r.getLong(1), 31))
    }
  }

  // ---------------- Merkle bucket diff ----------------

  test("bucket diff flags exactly the touched lanes; identity is clean") {
    val before = queries.tbl(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
    assert(Analytics.bucketDiff(before, before, Seq("o_orderkey"), cols,
      256).count() === 0L, "identical tables must produce zero diff rows")
    val after = before.where(col("o_orderkey") =!= 7L)
    val d = Analytics.bucketDiff(before, after, Seq("o_orderkey"), cols, 256)
      .collect()
    assert(d.length === 1, "one deleted key must dirty exactly one lane")
    assert(d(0).getAs[Long]("n_before") === d(0).getAs[Long]("n_after") + 1)
  }

  test("merkle drill-down statically prunes a bucket-partitioned store") {
    // the production layout: both table versions stored partitioned by
    // the checksum lane; the pass-2 key scan must read ONLY dirty lanes
    val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
    val buckets = 64
    val bucketOf = pmod(conv(substring(
      md5(col("o_orderkey").cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))
    val before = queries.tbl(spark, sf, "orders")
      .select(cols.map(col): _*)
    val after = before.where(col("o_orderkey") =!= 7L)
    val dir = java.nio.file.Files.createTempDirectory("merkle-store")
    before.withColumn("bucket", bucketOf).write
      .partitionBy("bucket").parquet(s"$dir/before")
    after.withColumn("bucket", bucketOf).write
      .partitionBy("bucket").parquet(s"$dir/after")
    // pass 1 on the summaries; the dirty list is lane-count bounded, so
    // collecting it into a static isin literal is always driver-safe
    val dirty = Analytics.bucketDiff(before, after, Seq("o_orderkey"),
      cols, buckets).select("bucket").collect().map(_.getLong(0)).toSeq
    assert(dirty.length === 1)
    val pruned = spark.read.parquet(s"$dir/before")
      .where(col("bucket").isin(dirty: _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.replaceAll("(?s).*PartitionFilters: \\[", "")
        .startsWith("]"),
      s"the dirty-lane filter must reach PartitionFilters:\n$plan")
    // and the pruned slice still finds exactly the differing key
    assert(pruned.select("o_orderkey").collect().map(_.getLong(0))
      .contains(7L))
  }

  test("bucket diff keys classifies added/removed/changed exactly") {
    val before = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val after = Seq((1L, "A", 10.0), (2L, "B", 25.0), (4L, "D", 40.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
    val got = Analytics.bucketDiffKeys(before, after, Seq("o_orderkey"),
        cols, 16)
      .orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  // ---------------- bloom-pruned semi join ----------------

  test("bloom-pruned semi join is row-identical to the plain semi join") {
    val li = queries.tbl(spark, sf, "lineitem")
    val dim = queries.tbl(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
    val pruned = graft.operators.BloomJoin
      .semiJoinBloom(li, dim, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val plain = li.join(dim.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(pruned === plain)
  }

  test("bloom probe filters the fact side below the semi join") {
    val li = queries.tbl(spark, sf, "lineitem")
    val dim = queries.tbl(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
    val p = graft.operators.BloomJoin
      .semiJoinBloom(li, dim, "l_orderkey", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("bloom_might_contain"),
      s"the prune must be the codegen Bloom probe:\n$p")
    // the tree prints root-first, so a child filter appears after its
    // parent join in the string
    assert(p.indexOf("bloom_might_contain") > p.indexOf("LeftSemi"),
      s"the probe must sit below the LeftSemi join:\n$p")
  }

  test("expectedKeys skips the sizing job; any estimate stays exact") {
    val li = queries.tbl(spark, sf, "lineitem")
    val dim = queries.tbl(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
    val plain = li.join(dim.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    // the build is synchronous, so all its jobs have started before
    // the call returns; poll until the async status store settles
    def groupJobs(group: String)(build: => org.apache.spark.sql.DataFrame)
        : (org.apache.spark.sql.DataFrame, Int) = {
      spark.sparkContext.setJobGroup(group, "bloom build", false)
      val df = try build finally spark.sparkContext.clearJobGroup()
      def ids() = spark.sparkContext.statusTracker
        .getJobIdsForGroup(group).length
      var last = -1
      var settles = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (settles < 3 && System.nanoTime() < deadline) {
        val now = ids()
        if (now == last && now > 0) settles += 1 else settles = 0
        last = now
        Thread.sleep(100)
      }
      (df, last)
    }
    val (_, sized) = groupJobs("bloom-sized") {
      graft.operators.BloomJoin.semiJoinBloom(
        li, dim, "l_orderkey", "o_orderkey")
    }
    // over- and (pathologically) under-estimated sizes: the exact
    // verify join keeps the result identical either way — sizing is a
    // perf knob, never a correctness one
    Seq(1000000L, 2L).foreach { est =>
      val (pruned, jobs) = groupJobs(s"bloom-est-$est") {
        graft.operators.BloomJoin.semiJoinBloom(
          li, dim, "l_orderkey", "o_orderkey", fpp = 0.01,
          expectedKeys = Some(est))
      }
      assert(jobs < sized,
        s"estimate must skip the sizing job: $jobs vs $sized without")
      assert(pruned.select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber").collect().toSeq === plain,
        s"estimate $est must not change the result")
    }
  }

  // ---------------- streaming recursive EWMA ----------------

  test("streaming ewma equals the batch replay across a batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingEwma
    import graft.streaming.StreamingEwma.EwmaEvent
    val ts: Long => java.sql.Timestamp =
      m => new java.sql.Timestamp(1704067200000L + m * 60000L)
    val batch1 = Seq(EwmaEvent(1L, 1L, ts(0), 10.0),
      EwmaEvent(1L, 2L, ts(1), 20.0), EwmaEvent(2L, 3L, ts(0), 5.0))
    val batch2 = Seq(EwmaEvent(1L, 4L, ts(2), 40.0),
      EwmaEvent(2L, 5L, ts(3), 15.0), EwmaEvent(3L, 6L, ts(0), 7.0))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EwmaEvent]
    val q = StreamingEwma.ewmaStream(input.toDS(), alpha = 0.3)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_ewma_test").start()
    val streamed = try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
      spark.table("stream_ewma_test")
        .select(col("event_id"), round(col("ewma"), 6).as("ewma"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    } finally q.stop()
    val replay = StreamingEwma.ewmaReplay(
        (batch1 ++ batch2).toDF(), "user_id", "event_id", "ts", "value",
        alpha = 0.3)
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("ewma_rec")))
      .toMap
    assert(streamed === replay,
      "mid-stream batch split must not change the recursion")
    // hand check: user 1 folds 10 -> .3*20+.7*10 = 13 -> .3*40+.7*13
    assert(math.abs(replay(2L) - 13.0) < 1e-9)
    assert(math.abs(replay(4L) - (0.3 * 40.0 + 0.7 * 13.0)) < 1e-6)
  }

  test("streaming welford anomaly equals replay across a batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{StreamingAnomaly, StreamingEwma}
    import graft.streaming.StreamingEwma.EwmaEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ts: Long => java.sql.Timestamp =
      m => new java.sql.Timestamp(1704067200000L + m * 60000L)
    // one key, 8 steady values then a spike; split mid-history
    val evs = (1L to 8L).map(i => EwmaEvent(1L, i, ts(i), 10.0 + i % 2)) :+
      EwmaEvent(1L, 9L, ts(9), 500.0)
    val (b1, b2) = evs.splitAt(4)
    val input = MemoryStream[EwmaEvent]
    val q = StreamingAnomaly.anomalyStream(input.toDS(), k = 3.0, minN = 5)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_anom_test").start()
    val streamed = try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      spark.table("stream_anom_test")
        .collect().map(r => (r.getAs[Long]("event_id"),
          (Option(r.getAs[java.lang.Double]("z")).map(_.toDouble),
            r.getAs[Boolean]("is_anomaly")))).toMap
    } finally q.stop()
    val replay = StreamingAnomaly.anomalyReplay(evs.toDF(), "user_id",
        "event_id", "ts", "value", k = 3.0, minN = 5)
      .collect().map(r => (r.getAs[Long]("event_id"),
        (Option(r.getAs[java.lang.Double]("z")).map(_.toDouble),
          r.getAs[Boolean]("is_anomaly")))).toMap
    assert(streamed === replay,
      "mid-history batch split must not change the recursion")
    assert(replay(9L)._2 === true, "the spike must flag")
    assert((1L to 5L).forall(!replay(_)._2),
      "cold-history rows must never flag")
  }

  // ---------------- duplicated-span removal ----------------

  test("strip spans: duplicated run survives only at its first home") {
    // docs 1 and 2 share the 2-gram "x y"; doc 1 keeps it, doc 2 loses
    // exactly the covered tokens; doc 3 is untouched
    val docs = Seq(
      (1L, "a x y b"), (2L, "c x y d"), (3L, "e f g h"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.stripDuplicatedSpans(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got(0) === ((1L, 0L, "a x y b")), "canonical home keeps the span")
    assert(got(1) === ((2L, 2L, "c d")), "non-canonical occurrence is cut")
    assert(got(2) === ((3L, 0L, "e f g h")))
  }

  test("strip spans: a fully duplicated doc empties out") {
    val docs = Seq((1L, "p q r s"), (2L, "p q r s")).toDF("doc_id", "text")
    val got = TextAnalysis.stripDuplicatedSpans(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(got(0) === ((1L, "p q r s")))
    assert(got(1) === ((2L, "")), "every token covered -> empty clean text")
  }

  test("strip spans: overlapping dup spans cover the union of indices") {
    // 'x y z' duplicated as two overlapping 2-grams in doc 2
    val docs = Seq((1L, "x y z"), (2L, "a x y z b")).toDF("doc_id", "text")
    val got = TextAnalysis.stripDuplicatedSpans(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(got(1) === ((2L, "a b")))
  }

  // ---------------- skew-salted join ----------------

  test("salted join equals the plain join, any salt count") {
    val li = queries.tbl(spark, sf, "lineitem")
    val sup = queries.tbl(spark, sf, "supplier")
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_name")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    Seq(1, 8).foreach { salts =>
      val got = graft.operators.BloomJoin.skewSaltedJoin(li, sup,
          "l_suppkey", "s_suppkey", Seq("l_orderkey", "l_linenumber"), salts)
        .select("l_orderkey", "l_linenumber", "s_name")
        .orderBy("l_orderkey", "l_linenumber").collect().toSeq
      assert(got === plain, s"salted ($salts lanes) must equal plain join")
    }
  }

  test("salted join under AQE skew handling: salt pre-spreads, AQE finds no skew") {
    // one hot key carries ~90% of the fact side — the shape AQE's
    // skew-join splitter exists for. After salting, no post-shuffle
    // partition is oversized, so AQE must mark no leg skew=true: the
    // manual salt and the adaptive splitter compose, never double-apply
    val fact = spark.range(20000).select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val dim = spark.range(50).select(col("id").as("dk"),
      (col("id") * 2).as("dv"))
    val conf = spark.conf
    val prevSkew = conf.get("spark.sql.adaptive.skewJoin.enabled")
    val prevBcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // force a shuffle join: broadcast would bypass the skew machinery
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = graft.operators.BloomJoin.skewSaltedJoin(
        fact, dim, "k", "dk", Seq("payload"), salts = 8)
      val rows = j.collect() // execute so AQE finalizes the plan
      assert(rows.length === 18005,
        "18000 hot-key rows + the 5 residue ids (0,10,20,30,40) in dim")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("__salt"),
        s"the exchange must carry the salt lane:\n$p")
      assert(!p.contains("skew=true"),
        s"a salted shuffle must leave AQE's skew splitter idle:\n$p")
    } finally {
      conf.set("spark.sql.adaptive.skewJoin.enabled", prevSkew)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
    }
  }

  test("salted join keys on (key, salt) — the two-level exchange") {
    val p = graft.operators.BloomJoin.skewSaltedJoin(
        queries.tbl(spark, sf, "lineitem"),
        queries.tbl(spark, sf, "supplier"),
        "l_suppkey", "s_suppkey", Seq("l_orderkey", "l_linenumber"), 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("xxhash64"), "salt must be a deterministic hash")
    assert(p.contains("__salt"),
      s"the join must carry the salt lane as a key:\n$p")
  }

  // ---------------- incremental join-view maintenance ----------------

  test("join-view maintenance equals the from-scratch recompute") {
    val fact = Seq((1L, 10L, 5.0), (2L, 20L, 6.0), (3L, 10L, 7.0))
      .toDF("pk", "fk", "v")
    val dim = Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("dk", "name")
    val view = fact.join(dim, col("fk") === col("dk"))
      .select("pk", "fk", "v", "name")
    // delete pk 2, re-key pk 3 to dim 30, insert pk 4
    val changes = Seq((2L, 0L, 0.0, "D"), (3L, 30L, 7.5, "U"),
        (4L, 20L, 8.0, "I"))
      .toDF("pk", "fk", "v", "op")
    val got = graft.operators.IncrementalAgg.maintainJoinView(
        view, dim, changes, Seq("pk"), Seq("pk", "fk", "v"), "fk", "dk",
        "op")
      .orderBy("pk").collect().map(_.toSeq).toSeq
    val factAfter = Seq((1L, 10L, 5.0), (3L, 30L, 7.5), (4L, 20L, 8.0))
      .toDF("pk", "fk", "v")
    val recompute = factAfter.join(dim, col("fk") === col("dk"))
      .select("pk", "fk", "v", "name")
      .orderBy("pk").collect().map(_.toSeq).toSeq
    assert(got === recompute)
  }

  test("join-view maintenance prunes survivors with a broadcast anti") {
    val fact = Seq((1L, 10L, 5.0)).toDF("pk", "fk", "v")
    val dim = Seq((10L, "x")).toDF("dk", "name")
    val view = fact.join(dim, col("fk") === col("dk"))
      .select("pk", "fk", "v", "name")
    val changes = Seq((1L, 10L, 9.0, "U")).toDF("pk", "fk", "v", "op")
    val p = graft.operators.IncrementalAgg.maintainJoinView(
        view, dim, changes, Seq("pk"), Seq("pk", "fk", "v"), "fk", "dk",
        "op")
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti") && p.contains("Broadcast"),
      s"survivor filter must be a broadcast anti join:\n$p")
  }

  // ---------------- naive-Bayes classifier ----------------

  test("nb ratios order by class evidence; scoring separates classes") {
    val docs = Seq(
      (1L, "good good fine", true), (2L, "good nice", true),
      (3L, "bad bad awful", false), (4L, "bad poor", false),
      (5L, "good fine nice", true))
      .toDF("id", "text", "pos")
    val model = NaiveBayes.train(docs, "text", col("pos"))
    val ratios = model.collect()
      .map(r => r.getString(0) -> r.getAs[Double]("ratio")).toMap
    assert(ratios("good") > 0.5 && ratios("bad") < 0.5)
    assert(ratios("good") > ratios("fine"),
      "more positive evidence must raise the ratio")
    val scores = NaiveBayes.score(model,
        Seq((10L, "good nice fine"), (11L, "bad awful poor"),
          (12L, "zzz unseen"), (13L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("nb_score"), r.getAs[Boolean]("nb_pred"))).toMap
    assert(scores(10L)._2 === true)
    assert(scores(11L)._2 === false)
    assert(scores(12L)._1 === 0.5 && scores(12L)._2 === false,
      "unseen-only docs must land exactly neutral")
    assert(scores(13L)._1 === 0.5, "null text must score neutral")
  }

  test("grouped kmv: per-group sketch matches the per-slice sketch") {
    val k = 64
    val grouped = Analytics.kmvSketchGrouped(events, "event_type",
        "event_id", k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val types = events.select("event_type").distinct()
      .collect().map(_.getString(0))
    types.foreach { t =>
      val direct = Analytics.kmvSketch(
          events.where(col("event_type") === t), "event_id", k)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(grouped(t) === direct,
        s"group $t sketch must equal the filtered-slice sketch")
    }
    // and the grouped estimate is the per-slice estimate
    val estG = Analytics.kmvEstimateGrouped(
        Analytics.kmvSketchGrouped(events, "event_type", "event_id", k), k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    types.foreach { t =>
      val est = Analytics.kmvEstimate(Analytics.kmvSketch(
        events.where(col("event_type") === t), "event_id", k), k)
        .head().getDouble(0)
      assert(estG(t) === est)
    }
  }

  test("kmv set ops are exact when both sides fit under k") {
    val a = events.where(col("user_id") < 8)
    val b = events.where(col("user_id") >= 4 && col("user_id") < 12)
    val r = Analytics.kmvSetOps(a, b, "user_id", 128).collect()(0)
    assert(r.getAs[Double]("est_a") === 8.0)
    assert(r.getAs[Double]("est_b") === 8.0)
    assert(r.getAs[Double]("est_union") === 12.0)
    assert(r.getAs[Double]("est_intersect") === 4.0)
    assert(math.abs(r.getAs[Double]("jaccard") - 4.0 / 12.0) < 1e-6)
  }
}
