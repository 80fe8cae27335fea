package graft

import org.apache.spark.sql.functions._
import graft.operators.{HeavyHitters, MisraGries}
import graft.streaming.StreamingTopK

/** Misra-Gries sketch + exact heavy hitters: superset guarantee under
  * arbitrary reduce/merge trees, exactness of the verify pass vs a full
  * GROUP BY, grouped equivalence, and edge shapes. */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private def exactByGroupBy(keys: Seq[String], minShare: Double) = {
    val n = keys.size
    keys.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c > n * minShare }.toMap
  }

  test("MG summary is a superset of true heavy hitters, any merge tree") {
    val rnd = new scala.util.Random(7)
    // 2 hot keys (~20% each) over a 200-key tail
    val keys = Seq.fill(5000)(
      if (rnd.nextDouble() < 0.4) s"hot${rnd.nextInt(2)}"
      else s"cold${rnd.nextInt(200)}")
    val mg = new MisraGries(20)
    // fold in shards of varying size, merge in a skewed tree
    val shards = keys.grouped(137).toSeq
      .map(sh => sh.foldLeft(mg.zero)(mg.reduce))
    val merged = shards.reduceLeft(mg.merge)
    val summary = mg.finish(merged)
    assert(summary.n === keys.size)
    val truth = exactByGroupBy(keys, 0.05).keySet
    assert(truth.subsetOf(summary.candidates.toSet),
      s"missing: ${truth -- summary.candidates.toSet}")
    assert(summary.candidates.size <= 20 + shards.size, // merge keeps <= k
      "summary did not stay bounded")
    assert(summary.candidates.size <= 20)
  }

  test("exact() equals the full GROUP BY ... HAVING answer") {
    val rnd = new scala.util.Random(11)
    val keys = Seq.fill(8000)(
      if (rnd.nextDouble() < 0.3) "dominant"
      else s"k${rnd.nextInt(500)}")
    val df = keys.toDF("key")
    val got = HeavyHitters.exact(df, col("key"), 0.1)
      .as[(String, Long, Double)].collect()
      .map { case (k, c, s) => k -> ((c, s)) }.toMap
    val want = exactByGroupBy(keys, 0.1)
    assert(got.keySet === want.keySet)
    want.foreach { case (k, c) =>
      assert(got(k)._1 === c)
      assert(math.abs(got(k)._2 - c.toDouble / keys.size) < 1e-12)
    }
  }

  test("exactGrouped() equals per-group GROUP BY ... HAVING") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(6000)((
      s"g${rnd.nextInt(3)}",
      if (rnd.nextDouble() < 0.25) s"hot${rnd.nextInt(2)}"
      else s"c${rnd.nextInt(300)}"))
    val df = rows.toDF("g", "key")
    val got = HeavyHitters
      .exactGrouped(df, col("g"), col("key"), 0.08)
      .select("g", "k", "cnt").as[(String, String, Long)]
      .collect().map { case (g, k, c) => (g, k) -> c }.toMap
    val want = rows.groupBy(_._1).flatMap { case (g, grp) =>
      val n = grp.size
      grp.groupBy(_._2).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c > n * 0.08 }
        .map { case (k, c) => (g, k) -> c }
    }
    assert(got === want)
  }

  test("no qualifying keys yields an empty frame; nulls ignored") {
    val df = (0 until 1000).map(i => s"k$i").toDF("key")
    assert(HeavyHitters.exact(df, col("key"), 0.05).count() === 0)
    val withNulls = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "a"), (3L, null), (4L, "a"), (5L, "b"))
      .toDF("id", "key")
    val hh = HeavyHitters.exact(withNulls, col("key"), 0.5)
      .as[(String, Long, Double)].collect()
    // n counts only non-null keys (4): a has 3/4 = 0.75 > 0.5
    assert(hh.toSeq === Seq(("a", 3L, 0.75)))
  }

  test("streaming MG equals the batch replay across a micro-batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingTopK
    import graft.streaming.StreamingTopK.HhEvent
    val k = 8
    val evs = (1 to 200).map { i =>
      HhEvent(i % 3, if (i % 4 == 0) "hot" else s"c${i % 37}")
    }
    val (b1, b2) = evs.splitAt(73)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[HhEvent]
    val q = StreamingTopK.topkStream(input.toDS(), k)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_topk_test").start()
    val frontier = try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val all = spark.table("stream_topk_test").collect()
        .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_seen"),
          r.getAs[String]("key"), r.getAs[Long]("lb")))
      all.groupBy(_._1).values.flatMap { rows =>
        val maxN = rows.map(_._2).max
        rows.filter(_._2 == maxN)
      }.toSet
    } finally q.stop()
    // batch twin folds each lane in the same (feed) order: index order
    val df = evs.zipWithIndex
      .map { case (e, i) => (e.shard, i.toLong, e.key) }
      .toDF("shard", "ord", "key")
    val replay = StreamingTopK.replayShards(df, col("shard"),
        col("ord"), col("key"), k)
      .as[(Int, Long, String, Long)].collect().toSet
    assert(frontier === replay,
      "micro-batch split must not change any lane's MG end state")
    // and the exact pass lands on the true answer regardless of order
    val hh = StreamingTopK.exactFromShards(
      replay.toSeq.toDF("shard", "n_seen", "key", "lb"),
      df, col("key"), 0.2)
      .as[(String, Long, Double)].collect()
    assert(hh.map(_._1).toSeq === Seq("hot")) // 50/200 = 0.25 > 0.2
    assert(hh.head._2 === 50L)
  }

  test("exactFromShards: n comes from the corpus, not lane emissions") {
    // lane 0's MG state EMPTIES (k=2, three distinct keys once each:
    // the third insert decrements both counters to zero), so
    // replayShards emits no rows at all for it — a lane-derived n
    // would miss lane 0's 3 rows, lowering the threshold and inflating
    // every share. The corpus-derived n must count all 13 rows.
    val lane0 = Seq("a", "b", "c").map(k => (0, "x" + k))
    val lane1 = (Seq.fill(8)("hot") ++ Seq("d", "e")).map(k => (1, k))
    val df = (lane0 ++ lane1).zipWithIndex
      .map { case ((sh, k), i) => (sh, i.toLong, k) }
      .toDF("shard", "ord", "key")
    val lanes = StreamingTopK.replayShards(df, col("shard"),
      col("ord"), col("key"), k = 2)
    assert(lanes.where(col("shard") === 0).count() === 0,
      "test premise: lane 0's summary must be empty")
    val hh = StreamingTopK.exactFromShards(lanes, df, col("key"), 0.5)
      .as[(String, Long, Double)].collect()
    // hot: 8/13 = 0.615 > 0.5 — but only against the TRUE n of 13
    assert(hh.toSeq === Seq(("hot", 8L, 8.0 / 13.0)))
  }

  test("exactFromShards: empty lane states / empty corpus, no NPE") {
    val empty = Seq.empty[(Int, Long, String, Long)]
      .toDF("shard", "n_seen", "key", "lb")
    val corpus = Seq((1, "a"), (2, "b")).toDF("id", "key")
    assert(StreamingTopK.exactFromShards(empty, corpus, col("key"), 0.1)
      .count() === 0)
    val lanes = Seq((0, 2L, "a", 2L)).toDF("shard", "n_seen", "key", "lb")
    val noCorpus = corpus.where(lit(false))
    assert(StreamingTopK.exactFromShards(lanes, noCorpus, col("key"), 0.1)
      .count() === 0)
  }

  test("exactFromShards: candidates join, never an In-literal plan") {
    // shards·k lane keys folded into isin(...) literals is an
    // analyzer/codegen-size hazard at scale — the plan must carry the
    // candidate set as a broadcast join, with no In/InSet over the
    // candidate strings anywhere
    val df = (Seq.fill(8)("hot") ++ Seq("d", "e")).zipWithIndex
      .map { case (k, i) => (0, i.toLong, k) }
      .toDF("shard", "ord", "key")
    val lanes = StreamingTopK.replayShards(df, col("shard"),
      col("ord"), col("key"), k = 2)
    // the corpus-scan stage (pre-localCheckpoint, where the candidate
    // membership lives) must plan as a broadcast join with no In/InSet
    val counts = StreamingTopK.candidateCounts(lanes, df, col("key"))
    import org.apache.spark.sql.catalyst.expressions.{In, InSet}
    val inLists = counts.queryExecution.optimizedPlan.collect {
      case p => p
    }.flatMap(_.expressions.flatMap(_.collect {
      case i: In => i
      case i: InSet => i
    }))
    assert(inLists.isEmpty,
      s"candidate membership must be a join, found: $inLists")
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    val joins = counts.queryExecution.optimizedPlan.collect {
      case j: Join => j
    }
    assert(joins.exists(_.hint.rightHint.exists(
        _.strategy.contains(BROADCAST))),
      s"expected a broadcast-hinted candidate join, plan: $joins")
    // and the answer is unchanged
    val hh = StreamingTopK.exactFromShards(lanes, df, col("key"), 0.5)
    assert(hh.as[(String, Long, Double)].collect().toSeq ===
      Seq(("hot", 8L, 0.8)))
  }

  test("exactGrouped: maxGroups guard fires without unbounded collect") {
    val df = Seq(("g1", "a"), ("g2", "b"), ("g3", "c"))
      .toDF("g", "k")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exactGrouped(df, col("g"), col("k"), 0.4,
        maxGroups = 2)
    }
    assert(e.getMessage.contains("more than 2 groups"))
  }

  test("sketch pass shuffles candidates, not the key space") {
    // the verify plan's aggregate runs on an isin-filtered scan: its
    // input cardinality is bounded by candidates, so the exchange
    // carries <= k distinct keys however wide the corpus
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val key = when(col("l_orderkey") % 3 === 0, lit("hot"))
      .otherwise(concat(lit("cold"), col("l_partkey")))
    val out = HeavyHitters.exact(li, key, 0.2)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("hot"), "candidate literal should reach the scan")
    assert(out.as[(String, Long, Double)].collect().map(_._1).toSeq
      === Seq("hot"))
  }
}
