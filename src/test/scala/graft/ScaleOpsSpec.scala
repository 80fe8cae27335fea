package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{BottomKSample, CdcMerge, HashSample, SaltedJoin, StratifiedSample}
import graft.streaming.SessionState
import graft.streaming.SessionState.Event

class ScaleOpsSpec extends SparkTestBase {

  test("deterministic split: partition, proportions, reproducibility") {
    import graft.operators.DeterministicSplit
    val o = queries.tbl(spark, sf, "orders")
    val s1 = DeterministicSplit(o, Seq("o_orderkey"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // total partition: every row in exactly one split
    assert(s1.count() === o.count())
    val byName = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet === Set("train", "val", "test"))
    // proportions near the weights (md5 uniformity; 1500 rows, 3 sigma)
    val n = o.count().toDouble
    assert(math.abs(byName("train") / n - 0.8) < 0.04)
    assert(math.abs(byName("val") / n - 0.1) < 0.03)
    // reproducible: same assignment under repartitioning
    val s2 = DeterministicSplit(o.repartition(13), Seq("o_orderkey"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s1.select("o_orderkey", "split")
      .exceptAll(s2.select("o_orderkey", "split")).count() === 0L)
  }

  test("incremental agg maintenance equals from-scratch recompute") {
    import graft.operators.IncrementalAgg
    import spark.implicits._
    val rows = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0), (3L, 7.0), (3L, 8.0))
      .toDF("k", "v")
    val base = rows.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("v_sum"))
    // insert k=4, update one k=1 row 10->11, delete BOTH k=3 rows
    val changes = Seq(
      (4L, Option.empty[Double], Some(42.0)),
      (1L, Some(10.0), Some(11.0)),
      (3L, Some(7.0), Option.empty[Double]),
      (3L, Some(8.0), Option.empty[Double]))
      .toDF("k", "old_v", "new_v")
    val got = IncrementalAgg.maintain(base, changes, "k", "old_v", "new_v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got === Map(1L -> (2L, 31.0), 2L -> (1L, 5.0), 4L -> (1L, 42.0)))
    assert(!got.contains(3L), "fully-deleted key drops out")
  }

  test("maintainFull: delete of an extremum recomputes only touched keys") {
    import graft.operators.IncrementalAgg
    import spark.implicits._
    val rows = Seq((1L, 10.0), (1L, 20.0), (1L, 15.0), (2L, 5.0), (2L, 9.0),
      (3L, 7.0)).toDF("k", "v")
    val base = rows.groupBy("k").agg(count(lit(1)).as("cnt"),
      sum("v").as("v_sum"), min("v").as("v_min"), max("v").as("v_max"))
    // k=1: delete the MAX (20) -> extremum invalidated, recompute path;
    // k=2: insert 12 (new max via pure delta) and update 5 -> 4 (the
    //      MIN's old value removed -> invalidated, recompute path);
    // k=3: untouched; k=4: brand-new key, insert-only delta path
    val changes = Seq(
      (1L, Some(20.0), Option.empty[Double]),
      (2L, Option.empty[Double], Some(12.0)),
      (2L, Some(5.0), Some(4.0)),
      (4L, Option.empty[Double], Some(42.0)))
      .toDF("k", "old_v", "new_v")
    val detail = Seq((1L, 10.0), (1L, 15.0), (2L, 4.0), (2L, 9.0),
      (2L, 12.0), (3L, 7.0), (4L, 42.0)).toDF("k", "v")
    val got = IncrementalAgg.maintainFull(base, changes, detail,
        "k", "v", "old_v", "new_v")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // every row equals the from-scratch recompute of `detail`
    assert(got === Map(
      1L -> (2L, 25.0, 10.0, 15.0),
      2L -> (3L, 25.0, 4.0, 12.0),
      3L -> (1L, 7.0, 7.0, 7.0),
      4L -> (1L, 42.0, 42.0, 42.0)))
  }

  test("foreachBatch + IncrementalAgg: streamed maintenance == recompute") {
    import graft.operators.IncrementalAgg
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the production IVM loop: each micro-batch of before/after changes
    // folds into the aggregate table via one O(delta) join; the state
    // version flips through localCheckpoint (standing in for a table-
    // format commit), so lineage never grows across batches
    val input = MemoryStream[(Long, Option[Double], Option[Double])]
    var state = Seq.empty[(Long, Long, Double)].toDF("k", "cnt", "v_sum")
    val q = input.toDF().toDF("k", "old_v", "new_v")
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = IncrementalAgg.maintain(state, batch, "k", "old_v", "new_v")
          .localCheckpoint()
      }.start()
    try {
      // batch 1: insert k=1:{10, 20}, k=2:{5}
      input.addData((1L, None, Some(10.0)), (1L, None, Some(20.0)),
        (2L, None, Some(5.0)))
      q.processAllAvailable()
      // batch 2: update 10 -> 12, insert k=3:{7}
      input.addData((1L, Some(10.0), Some(12.0)), (3L, None, Some(7.0)))
      q.processAllAvailable()
      // batch 3: delete k=2's only row
      input.addData((2L, Some(5.0), None))
      q.processAllAvailable()
      // final table by construction: k=1 {12,20}, k=3 {7}
      val got = state.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got === Map(1L -> (2L, 32.0), 3L -> (1L, 7.0)))
    } finally q.stop()
  }

  test("foreachBatch + maintainFull: streamed min/max maintenance == recompute") {
    import graft.operators.IncrementalAgg
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the maintainFull loop folds each micro-batch into BOTH the detail
    // table (CDC apply) and the aggregate table; the extremum-recompute
    // path reads the post-batch detail, exactly as a table-format
    // pipeline would read the just-committed snapshot
    val input = MemoryStream[(Long, Option[Double], Option[Double])]
    var detail = Seq.empty[(Long, Double)].toDF("k", "v")
    var state = Seq.empty[(Long, Long, Double, Double, Double)]
      .toDF("k", "cnt", "v_sum", "v_min", "v_max")
    val q = input.toDF().toDF("k", "old_v", "new_v")
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        // apply the feed to the detail table: drop old values, add new
        val removed = b.filter(col("old_v").isNotNull)
          .select(col("k"), col("old_v").as("v"))
        detail = detail.exceptAll(removed)
          .unionAll(b.filter(col("new_v").isNotNull)
            .select(col("k"), col("new_v").as("v")))
          .localCheckpoint()
        state = IncrementalAgg.maintainFull(state, b, detail,
          "k", "v", "old_v", "new_v").localCheckpoint()
      }.start()
    try {
      // batch 1: k=1 {10, 20, 15}, k=2 {5}
      input.addData((1L, None, Some(10.0)), (1L, None, Some(20.0)),
        (1L, None, Some(15.0)), (2L, None, Some(5.0)))
      q.processAllAvailable()
      // batch 2: delete k=1's MAX (20) -> extremum recompute; insert 3
      input.addData((1L, Some(20.0), None), (1L, None, Some(3.0)))
      q.processAllAvailable()
      // batch 3: update k=2's only row 5 -> 7 (min AND max move)
      input.addData((2L, Some(5.0), Some(7.0)))
      q.processAllAvailable()
      val got = state.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      // recompute oracle over the final detail {1:{10,15,3}, 2:{7}}
      assert(got === Map(
        1L -> (3L, 28.0, 3.0, 15.0),
        2L -> (1L, 7.0, 7.0, 7.0)))
    } finally q.stop()
  }

  test("winsorize: clipped values stay inside the band, interior untouched") {
    import graft.operators.Analytics
    val e = queries.tbl(spark, sf, "events")
    val w = Analytics.winsorize(e, Seq("event_type"), "value", 0.05, 0.95)
    assert(w.count() === e.count())
    // clipped equals raw wherever raw is inside the band; boundary rows
    // take exactly a cutpoint value
    val cuts = e.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.05)"), 6).as("lo"),
        round(expr("percentile(value, 0.95)"), 6).as("hi"))
    val joined = w.join(cuts, "event_type")
    assert(joined.filter(col("clipped") < col("lo") ||
      col("clipped") > col("hi")).count() === 0L)
    assert(joined.filter(col("value") >= col("lo") &&
      col("value") <= col("hi") && col("clipped") =!= col("value"))
      .count() === 0L)
    assert(joined.filter(col("value") < col("lo") &&
      col("clipped") =!= col("lo")).count() === 0L)
  }
  import spark.implicits._

  test("salted join is row-identical to the plain join (inner and left)") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    Seq("inner", "left").foreach { jt =>
      val plain = orders.join(customer, Seq("o_custkey"), jt)
        .select("o_orderkey", "c_name").collect().map(_.toSeq).toSet
      val salted = SaltedJoin(orders, customer, Seq("o_custkey"), salts = 7,
        joinType = jt).select("o_orderkey", "c_name")
        .collect().map(_.toSeq).toSet
      assert(salted === plain, s"join type $jt")
    }
  }

  test("bottom-k sample is deterministic and partitioning-independent") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val keys = Seq("l_orderkey", "l_linenumber")
    // note: testdata lineitem has duplicate (orderkey, linenumber) pairs,
    // so compare as sorted multisets
    def sample(df: org.apache.spark.sql.DataFrame) =
      BottomKSample(df, 100, keys).select(keys.map(col): _*)
        .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString(","))
    val s1 = sample(li)
    val s2 = sample(li.repartition(13))
    assert(s1.length === 100 && s1 === s2)
    // plans as a top-k, not a global sort
    assert(BottomKSample(li, 100, keys).queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("hash sample keeps a stable fraction with zero shuffle") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val n = li.count().toDouble
    val sampled = HashSample(li, 0.25, Seq("l_orderkey", "l_linenumber"))
    val k = sampled.count().toDouble
    assert(math.abs(k / n - 0.25) < 0.03)
    assert(!sampled.queryExecution.executedPlan.toString.contains("Exchange"))
    // re-evaluation returns the identical subset
    assert(sampled.count() === k.toLong)
  }

  test("md5-keyed samplers: deterministic, engine-portable key, no shuffle") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    // unique key: ties at the bottom-k cut would otherwise be arbitrary
    val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    def bk(df: org.apache.spark.sql.DataFrame) =
      BottomKSample(df, 100, keys, hash = graft.operators.Md5)
        .select(keys.map(col): _*)
        .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString(","))
    assert(bk(li) === bk(li.repartition(13)))
    val sampled = HashSample(li, 0.25, keys, hash = graft.operators.Md5)
    val frac = sampled.count().toDouble / li.count().toDouble
    assert(math.abs(frac - 0.25) < 0.03)
    assert(!sampled.queryExecution.executedPlan.toString.contains("Exchange"))
    // pin the key rendering ('|'-joined decimal ints -> lowercase-hex md5):
    // the DuckDB oracle recomputes this digest byte-for-byte
    val hex = li.limit(0).sparkSession.sql(
      "SELECT md5(concat_ws('|', '3', '1', '7', '2'))").head().getString(0)
    assert(hex ===
      java.security.MessageDigest.getInstance("MD5").digest(
        "3|1|7|2".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("stratified sample: exact per-stratum quota, partitioning-independent") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val k = 10
    def run(df: org.apache.spark.sql.DataFrame) =
      StratifiedSample(df, k, Seq("o_orderstatus"), Seq("o_orderkey"),
        hash = graft.operators.Md5)
    val s1 = run(orders)
    // quota: min(k, stratum size) rows per stratum, never more
    val quotas = s1.groupBy("o_orderstatus").count().collect()
    assert(quotas.nonEmpty && quotas.forall(_.getLong(1) <= k.toLong))
    // deterministic under repartitioning: same rows chosen
    val a = s1.select("o_orderkey").collect().map(_.getLong(0)).sorted
    val b = run(orders.repartition(13)).select("o_orderkey").collect()
      .map(_.getLong(0)).sorted
    assert(a === b)
    // subset of the input, and the sample is a real cut (not everything)
    assert(s1.count() < orders.count())
  }

  test("stratified prefilter: identical rows to the plain form, both hashes") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val k = 10
    for (h <- Seq[graft.operators.SampleHash](graft.operators.Xx64,
        graft.operators.Md5)) {
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("o_orderkey").collect().map(_.getLong(0)).sorted
      val plain = rows(StratifiedSample(orders, k,
        Seq("o_orderstatus"), Seq("o_orderkey"), hash = h))
      val pre = rows(StratifiedSample(orders, k,
        Seq("o_orderstatus"), Seq("o_orderkey"), hash = h,
        prefilterMargin = Some(8)))
      assert(pre === plain, s"prefilter changed the sample under $h")
    }
  }

  test("stratified prefilter: 90%-one-stratum corpus, bounded rows reach the sort") {
    // hot-stratum regime: stratum 0 holds 90% of rows. The prefilter must
    // cut it to ~c*k before the window, and the cut must stay exact.
    val n = 50000L
    val hot = spark.range(n).select(
      when(pmod(col("id"), lit(10)) < 9, lit(0)).otherwise(lit(1)).as("s"),
      col("id"))
    val k = 50
    val got = StratifiedSample(hot, k, Seq("s"), Seq("id"),
      prefilterMargin = Some(8))
    val plain = StratifiedSample(hot, k, Seq("s"), Seq("id"))
    assert(got.select("id").collect().map(_.getLong(0)).sorted ===
      plain.select("id").collect().map(_.getLong(0)).sorted)
    // the pre-window stream really is bounded: count rows surviving the
    // prefilter via the same threshold math (c*k per stratum, not 45k)
    val quotas = got.groupBy("s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(quotas === Map(0 -> k.toLong, 1 -> k.toLong))
  }

  test("bucketed tables co-locate: join without a shuffle exchange") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("global shuffle rank: a permutation, epoch-sensitive, bucketed plan") {
    import graft.operators.{GlobalShuffleRank, Md5, Xx64}
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val n = docs.count()
    val ranked = GlobalShuffleRank(docs, Seq("doc_id"), epoch = 7L)
    // output schema = input + posCol, no internal columns leaked
    assert(ranked.columns.toSeq === Seq("doc_id", "pos"))
    // positions are exactly 0..n-1 (a permutation, no gaps or dups)
    val pos = ranked.select("pos").as[Long].collect().sorted
    assert(pos.toSeq === (0L until n).toSeq)
    // matches the single-window reference computation for both families
    Seq(Xx64: graft.operators.SampleHash, Md5).foreach { fam =>
      val got = GlobalShuffleRank(docs, Seq("doc_id"), epoch = 7L, hash = fam)
        .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val key = fam match {
        case Xx64 => xxhash64(lit("7"), col("doc_id").cast("string"))
        case Md5  => md5(concat_ws("|", lit("7"), col("doc_id").cast("string")))
      }
      val w = org.apache.spark.sql.expressions.Window.orderBy(key, col("doc_id"))
      val ref = docs.select(col("doc_id"), (row_number().over(w) - 1).cast("long").as("p"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === ref, s"family $fam")
    }
    // a different epoch yields a different permutation
    val other = GlobalShuffleRank(docs, Seq("doc_id"), epoch = 8L)
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val base = ranked.select("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(other !== base)
    // partitioning-independent (the determinism contract)
    val reparted = GlobalShuffleRank(docs.repartition(13), Seq("doc_id"), epoch = 7L)
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(reparted === base)
    // the ONLY unpartitioned window runs over the bucket-count table, so
    // every Sort of the corpus side is preceded by a hash exchange on the
    // bucket — no single-task global sort of the data
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(__bkt"),
      s"corpus rank must shuffle on the hash bucket:\n$plan")
  }

  test("mixture sample: exact per-source quotas, shortfall on small sources") {
    import graft.operators.{MixtureSample, Md5}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val natural = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Map("en" -> 0.5, "zh" -> 0.2, "de" -> 0.3)
    val total = 40L
    val out = MixtureSample(docs, "lang", targets, total, Seq("doc_id"),
      hash = Md5)
    val mix = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every source hits min(quota, available); absent sources contribute 0
    targets.foreach { case (srcLang, frac) =>
      val quota = math.floor(total * frac + 0.5).toLong
      assert(mix.getOrElse(srcLang, 0L)
        === math.min(quota, natural.getOrElse(srcLang, 0L)), s"lang $srcLang")
    }
    assert(mix.keySet.subsetOf(targets.keySet))
    // deterministic across partitionings
    val again = MixtureSample(docs.repartition(11), "lang", targets, total,
      Seq("doc_id"), hash = Md5).select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === out.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("cdc merge: upsert, delete, insert, out-of-order seq, untouched rows") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      // k=1: two upserts out of order — seq (5,_) wins over (3,_)
      (1L, "U", 3L, 100L, 11.0),
      (1L, "U", 5L, 101L, 12.0),
      // k=2: upsert then delete — delete is latest, row vanishes
      (2L, "U", 1L, 102L, 21.0),
      (2L, "D", 2L, 103L, 0.0),
      // k=4: insert (not in base); same seq, higher id wins the tie
      (4L, "U", 7L, 104L, 40.0),
      (4L, "U", 7L, 105L, 41.0),
      // k=5: delete of a key the base never had — stays absent
      (5L, "D", 9L, 106L, 0.0)
    ).toDF("k", "op", "seq", "id", "bal")
    val out = CdcMerge(base, changes, "k", "op", Seq("seq", "id"), Seq("bal"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDouble(2))).toSeq
    assert(out === Seq(
      (1L, Some("a"), 12.0),   // latest upsert applied, name kept
      (3L, Some("c"), 30.0),   // untouched
      (4L, None, 41.0)))       // inserted; non-set base cols null
    // plan shape: the changelog collapses via aggregate, not a window
    val plan = CdcMerge(base, changes, "k", "op", Seq("seq", "id"), Seq("bal"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && plan.contains("max_by"))
  }
}

class SessionStateSpec extends SparkTestBase {
  import spark.implicits._

  private val gapNs = 30L * 60 * 1000000000L // 30 min

  test("batch flatMapGroups sessionization: gap and max-events closure") {
    val mins: Long => Long = m => m * 60L * 1000000000L
    val events = Seq(
      Event(1L, mins(0), "view", 1.0),
      Event(1L, mins(10), "click", 2.0),
      Event(1L, mins(20), "purchase", 3.0), // same session (gaps < 30min)
      Event(1L, mins(120), "view", 4.0), // gap -> new session
      Event(2L, mins(0), "a", 1.0), Event(2L, mins(1), "b", 1.0),
      Event(2L, mins(2), "c", 1.0), Event(2L, mins(3), "d", 1.0) // max 3
    ).toDS()
    val out = SessionState.batchSessions(spark, events, gapNs, maxEvents = 3)
      .collect().sortBy(s => (s.user_id, s.session_start_sec))
    val u1 = out.filter(_.user_id == 1L)
    assert(u1.length === 2)
    assert(u1(0).n === 3 && u1(0).first_type === "view"
      && u1(0).last_type === "purchase" && u1(0).sum_value === 6.0
      && u1(0).closed_by === "gap")
    assert(u1(1).n === 1 && u1(1).closed_by === "end")
    val u2 = out.filter(_.user_id == 2L)
    assert(u2.map(_.n).toSeq === Seq(3, 1)) // max_events split
    assert(u2(0).closed_by === "max_events")
  }

  test("streaming flatMapGroupsWithState emits closed sessions incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = SessionState.streamingSessions(spark, input.toDS(), gapNs, 100)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_stream").start()
    try {
      // epoch base away from 1970: the watermark starts at 0 and events
      // at ts <= watermark are dropped as late
      val base = 1704067200L * 1000000000L // 2024-01-01
      val mins: Long => Long = m => base + m * 60L * 1000000000L
      input.addData(Event(1L, mins(0), "view", 1.0),
        Event(1L, mins(5), "click", 2.0))
      q.processAllAvailable()
      // session still open -> nothing emitted yet
      assert(spark.table("sessions_stream").count() === 0)
      input.addData(Event(1L, mins(90), "view", 9.0)) // gap closes session 1
      q.processAllAvailable()
      val emitted = spark.table("sessions_stream").as[SessionState.SessionOut]
        .collect()
      assert(emitted.length === 1)
      assert(emitted(0).n === 2 && emitted(0).closed_by === "gap")
    } finally q.stop()
  }

  test("streaming state is O(1): max_events successor <1s later, no re-emit") {
    // regression: the old event-buffer state rebuilt its tail from the open
    // session's start truncated to whole SECONDS, so a session closed by
    // max_events whose successor started <1s later re-included (and
    // re-emitted) the closed session's events in the next batch
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = SessionState.streamingSessions(spark, input.toDS(), gapNs, 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_maxev").start()
    try {
      val base = 1704067200L * 1000000000L // 2024-01-01 (see above re: 1970)
      val ms: Long => Long = m => base + m * 1000000L // base + milliseconds
      // 3 events cap the session; the 4th lands 100ms later (same second)
      input.addData(Event(1L, ms(0), "a", 1.0), Event(1L, ms(100), "b", 1.0),
        Event(1L, ms(200), "c", 1.0), Event(1L, ms(300), "d", 1.0))
      q.processAllAvailable()
      val first = spark.table("sessions_maxev").as[SessionState.SessionOut]
        .collect()
      assert(first.length === 1 && first(0).closed_by === "max_events"
        && first(0).n === 3)
      // next batch: event 500ms after the open session's start — must merge
      // into the open session, not resurrect the closed one
      input.addData(Event(1L, ms(800), "e", 1.0))
      q.processAllAvailable()
      val emitted = spark.table("sessions_maxev").as[SessionState.SessionOut]
        .collect()
      assert(emitted.length === 1, "closed session must not re-emit")
    } finally q.stop()
  }

  test("idle user's open session flushes via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = SessionState.streamingSessions(spark, input.toDS(), gapNs, 100)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_timeout").start()
    try {
      // realistic epoch base: the initial watermark is 0, so 1970-adjacent
      // events would be dropped as late
      val base = 1704067200L * 1000000000L // 2024-01-01
      val mins: Long => Long = m => base + m * 60L * 1000000000L
      input.addData(Event(1L, mins(0), "view", 1.0),
        Event(1L, mins(5), "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_timeout").count() === 0) // still open
      // a different user's event advances the watermark far past
      // user 1's (end + gap) timeout -> user 1's open session flushes
      input.addData(Event(2L, mins(240), "view", 9.0))
      q.processAllAvailable()
      val emitted = spark.table("sessions_timeout")
        .as[SessionState.SessionOut].collect()
      val u1 = emitted.filter(_.user_id == 1L)
      assert(u1.length === 1 && u1(0).closed_by === "timeout" && u1(0).n === 2)
    } finally q.stop()
  }

  test("watermarked stream-stream interval join (purchase <- recent click)") {
    import graft.streaming.EventWindows
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val ev = input.toDS()
      .withColumn("t", EventWindows.nsToTs(col("ts_ns")))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"t".as("p_t"), $"value".as("p_value"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"t".as("c_t"), $"value".as("c_value"))
    val joined = EventWindows.streamingIntervalJoin(purchases, clicks,
      "p_user", "c_user", "p_t", "c_t",
      watermark = "1 hour", within = "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    try {
      // realistic epoch base: Spark's initial watermark is 0, so events
      // near 1970 are dropped as late before any data arrives
      val base = 1704067200L * 1000000000L // 2024-01-01
      val mins: Long => Long = m => base + m * 60L * 1000000000L
      input.addData(
        Event(1L, mins(0), "click", 1.0), // 20 min before purchase: joins
        Event(1L, mins(20), "purchase", 100.0),
        Event(2L, mins(0), "click", 2.0), // 2h before purchase: outside window
        Event(2L, mins(120), "purchase", 200.0))
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .select("p_user", "p_value", "c_value").collect()
      assert(rows.length === 1)
      assert(rows.head.getLong(0) === 1L && rows.head.getDouble(2) === 1.0)
    } finally q.stop()
  }

  test("batch sessionization on real events agrees with a naive reference") {
    val ds = SessionState.fromEventsTable(spark,
      graft.queries.tbl(spark, sf, "events"))
    val got = SessionState.batchSessions(spark, ds, gapNs, Int.MaxValue)
      .collect().map(s => (s.user_id, s.session_start_sec, s.n)).toSet
    // naive reference computed on the driver
    val ref = ds.collect().groupBy(_.user_id).flatMap { case (u, evs) =>
      SessionState.sessionize(evs.iterator, gapNs, Int.MaxValue)
    }.map(s => (s.user_id, s.session_start_sec, s.n)).toSet
    assert(got === ref)
  }

}
