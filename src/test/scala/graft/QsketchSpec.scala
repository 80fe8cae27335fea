package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Unit properties of the mergeable bottom-k-by-hash quantile sketch
  * (the cross-engine replay is gated by `agg_qsketch[_merge]`). */
class QsketchSpec extends SparkTestBase {
  import spark.implicits._

  private def sample(n: Int, k: Int) =
    Analytics.qsketchSample(
      (1 to n).map(i => (i.toLong, i.toDouble)).toDF("id", "x"),
      col("id"), "x", k)

  test("sample is capped at k and is a subset of the input values") {
    val s = sample(5000, 64).collect()
    assert(s.length === 64)
    assert(s.forall(r => r.getDouble(1) >= 1.0 && r.getDouble(1) <= 5000.0))
  }

  test("shard merge is EXACT: identical rows to the direct sample") {
    val df = (1 to 4000).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    for (shards <- Seq(2, 3, 7)) {
      val parts = (0 until shards).map(r =>
        Analytics.qsketchSample(df.where(col("id") % shards === r),
          col("id"), "x", 128))
      val merged = Analytics.qsketchMerge(parts, 128)
        .orderBy("h").collect().toSeq
      val direct = Analytics.qsketchSample(df, col("id"), "x", 128)
        .orderBy("h").collect().toSeq
      assert(merged === direct, s"merge must be exact at $shards shards")
    }
  }

  test("lower-index rule: known elements on a fully-sampled input") {
    // k >= n: the sample IS the data, so quantiles are exact order stats
    val s = sample(101, 1024) // values 1..101, n = 101
    val q = Analytics.qsketchQuantiles(s,
        Seq("0.00" -> 0.0, "0.50" -> 0.5, "0.99" -> 0.99, "1.00" -> 1.0))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(q("0.00") === 1.0) // idx 0
    assert(q("0.50") === 51.0) // idx floor(0.5*100) = 50
    assert(q("0.99") === 100.0) // idx floor(99.0) = 99
    assert(q("1.00") === 101.0) // idx 100: the max
  }

  test("estimates converge on the exact quantile as k grows") {
    val n = 20000
    def p90(k: Int): Double = {
      val s = sample(n, k)
      Analytics.qsketchQuantiles(s, Seq("p" -> 0.9))
        .head().getDouble(1)
    }
    val errSmall = math.abs(p90(64) - 18000.0) / 18000.0
    val errBig = math.abs(p90(4096) - 18000.0) / 18000.0
    assert(errBig < errSmall || errBig < 0.005,
      s"k=4096 err $errBig must beat k=64 err $errSmall")
    assert(errBig < 0.05, s"p90 at k=4096 off by $errBig")
  }

  test("sample plans as TakeOrderedAndProject (no global sort)") {
    val p = sample(1000, 32).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$p")
    assert(!p.contains("Sort "), s"no global sort expected:\n$p")
  }

  test("equi-depth range buckets: cover, balance, determinism") {
    val n = 8000
    val df = (1 to n).map(i => (i.toLong,
      (i * 2654435761L % 100000L).toDouble)).toDF("id", "x")
    val b = Analytics.qsketchRangeBuckets(df, col("id"), "x", 1024, 8)
    val counts = b.groupBy("bucket").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(counts.keySet.subsetOf((0 until 8).toSet), "buckets in range")
    assert(counts.values.sum === n.toLong, "every row lands in a bucket")
    // k=1024 of 8000 rows: rank error O(1/sqrt k) — generous 2x bound
    assert(counts.values.forall(c => c > n / 16 && c < n / 4),
      s"buckets roughly balanced: $counts")
    // deterministic: same cuts, same assignment, run to run
    val again = Analytics.qsketchRangeBuckets(df, col("id"), "x", 1024, 8)
      .groupBy("bucket").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(again === counts)
    // k >= n: the sample is the data -> EXACT equi-depth
    val small = (1 to 80).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val exact = Analytics.qsketchRangeBuckets(small, col("id"), "x", 1024, 4)
      .groupBy("bucket").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    // lower-index cuts at p=.25/.5/.75 of 0..79 -> 20/40/60 -> buckets
    // of 20/20/20/20 (cut value itself closes the lower bucket)
    assert(exact === Map(0 -> 20L, 1 -> 20L, 2 -> 20L, 3 -> 20L))
  }

  test("sketch-guided exact selection equals the exact percentile aggregate") {
    val n = 7001
    val df = (1 to n).map(i => (i.toLong,
      ((i * 2654435761L % 99991L).toDouble / 7.0))).toDF("id", "x")
    val probs = Seq("0.00" -> 0.0, "0.25" -> 0.25, "0.50" -> 0.5,
      "0.90" -> 0.9, "0.99" -> 0.99, "1.00" -> 1.0)
    val sel = Analytics.exactQuantilesSelect(df, col("id"), "x", probs,
        k = 256, nBuckets = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val agg = df.agg(percentile(col("x"),
        array(probs.map(p => lit(p._2)): _*)).as("qs"))
      .head().getSeq[Double](0)
    probs.map(_._1).zip(agg).foreach { case (label, want) =>
      assert(math.abs(sel(label) - want) < 1e-9,
        s"p$label: selection ${sel(label)} vs aggregate $want")
    }
    // duplicate-heavy values (lanes share boundaries) stay exact
    val dup = (1 to 1000).map(i => (i.toLong, (i % 5).toDouble))
      .toDF("id", "x")
    val sd = Analytics.exactQuantilesSelect(dup, col("id"), "x",
        Seq("0.5" -> 0.5), k = 64, nBuckets = 8)
      .head().getDouble(1)
    assert(sd === dup.agg(percentile(col("x"), lit(0.5))).head().getDouble(0))
  }

  test("exact selection: randomized parity with the percentile aggregate") {
    // deterministic seed; hostile shapes: tiny n (every rank lane-
    // boundary), heavy duplicates (lanes sharing cut values), skewed
    // magnitudes, k >= n and k << n, coarse and fine lane counts
    val rnd = new scala.util.Random(0xC0FFEE)
    for (trial <- 1 to 6) {
      val n = Seq(3, 17, 400, 2000)(trial % 4)
      val dupMod = Seq(0, 5, 50)(trial % 3) // 0 = all-distinct
      val data = (1 to n).map { i =>
        val base = rnd.nextDouble() * math.pow(10, trial % 5)
        (i.toLong, if (dupMod == 0) base else (i % dupMod).toDouble)
      }
      val df = data.toDF("id", "x")
      val (k, nb) = (Seq(4, 64, 4096)(trial % 3), Seq(2, 7, 32)(trial % 3))
      val probs = Seq("0" -> 0.0, "a" -> rnd.nextDouble(),
        "b" -> rnd.nextDouble(), "1" -> 1.0)
      val sel = Analytics.exactQuantilesSelect(df, col("id"), "x",
          probs, k = k, nBuckets = nb)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val agg = df.agg(percentile(col("x"),
          array(probs.map(p => lit(p._2)): _*)).as("qs"))
        .head().getSeq[Double](0)
      probs.map(_._1).zip(agg).foreach { case (label, want) =>
        assert(math.abs(sel(label) - want) <= 1e-9 * math.max(1.0,
          math.abs(want)),
          s"trial $trial n=$n dup=$dupMod k=$k nb=$nb p$label: " +
            s"${sel(label)} vs $want")
      }
    }
  }

  test("grouped equi-depth buckets balance within EACH group") {
    // groups with wildly different distributions: each must still
    // split into ~equal quarters under its OWN cuts
    val df = ((1 to 4000).map(i => (i.toLong, "lin",
        (i % 1000).toDouble)) ++
      (1 to 4000).map(i => (i.toLong + 10000, "exp",
        math.pow(1.01, i % 800)))).toDF("id", "g", "x")
    val counts = Analytics.qsketchRangeBucketsGrouped(df, "g", col("id"),
        "x", 512, 4)
      .groupBy("g", "bucket").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(counts.values.sum === 8000L, "every row lands in a bucket")
    Seq("lin", "exp").foreach { g =>
      (0 until 4).foreach { b =>
        val c = counts.getOrElse((g, b), 0L)
        assert(c > 500 && c < 2000,
          s"group $g bucket $b must stay ~balanced, got $c")
      }
    }
  }

  test("grouped exact selection equals the per-group percentile aggregate") {
    val df = (1 to 6000).map(i => (i.toLong, s"g${i % 7}",
      ((i * 48271L % 9973L).toDouble / 3.0))).toDF("id", "g", "x")
    val probs = Seq("0.10" -> 0.1, "0.50" -> 0.5, "0.99" -> 0.99)
    val sel = Analytics.exactQuantilesSelectGrouped(df, "g", col("id"),
        "x", probs, k = 256, nBuckets = 8)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val agg = df.groupBy("g")
      .agg(percentile(col("x"), array(probs.map(p => lit(p._2)): _*))
        .as("qs"))
      .collect()
      .flatMap(r => probs.map(_._1).zip(r.getSeq[Double](1))
        .map { case (l, v) => (r.getString(0), l) -> v }).toMap
    assert(sel.keySet === agg.keySet)
    sel.foreach { case (key, v) =>
      assert(math.abs(v - agg(key)) < 1e-9, s"$key: $v vs ${agg(key)}")
    }
  }

  test("streaming sketch equals the batch replay across a micro-batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingQsketch
    import graft.streaming.StreamingQsketch.QsEvent
    val k = 8
    // deterministic synthetic feed across 3 shards; hashes mimic the
    // md5-prefix domain but any longs exercise the same fold
    val evs = (1 to 100).map { i =>
      QsEvent(i % 3, (i.toLong * 2654435761L) % 1000003L, i.toDouble)
    }
    val (b1, b2) = evs.splitAt(37)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[QsEvent]
    val q = StreamingQsketch.qsketchStream(input.toDS(), k)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_qsketch_test").start()
    val frontier = try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val all = spark.table("stream_qsketch_test").collect()
        .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_seen"),
          r.getAs[Long]("h"), r.getAs[Double]("v")))
      // latest emission per shard = max n_seen
      val latest = all.groupBy(_._1).map { case (_, rows) =>
        val maxN = rows.map(_._2).max
        rows.filter(_._2 == maxN)
      }
      latest.flatten.map(r => (r._1, r._3, r._4)).toSet
    } finally q.stop()
    // batch twin: per-shard bottom-k by (h, v) on the full feed
    val expect = evs.groupBy(_.shard).flatMap { case (s, rows) =>
      rows.map(r => (r.h, r.v)).sorted.take(k).map(hv => (s, hv._1, hv._2))
    }.toSet
    assert(frontier === expect,
      "micro-batch split must not change any shard's end-state sketch")
  }

  test("sharded replay + exact merge equals the direct sample end to end") {
    import graft.streaming.StreamingQsketch
    val df = (1 to 3000).map(i => (i.toLong, i.toLong % 5,
      (i * 37 % 1000).toDouble)).toDF("id", "u", "x")
    val shards = StreamingQsketch.qsketchReplayShards(df,
      col("u"), col("id"), "x", 64)
    val est = StreamingQsketch.mergedQuantiles(shards, 64,
      Seq("0.5" -> 0.5, "0.9" -> 0.9)).orderBy("prob").collect()
    val direct = Analytics.qsketchQuantiles(
        Analytics.qsketchSample(df, col("id"), "x", 64),
        Seq("0.5" -> 0.5, "0.9" -> 0.9)).orderBy("prob").collect()
    assert(est.map(_.getDouble(1)).toSeq ===
      direct.map(_.getDouble(1)).toSeq,
      "lane-sketch union must re-sketch to the direct corpus sample")
  }
}
