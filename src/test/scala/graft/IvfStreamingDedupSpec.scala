package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.streaming.StreamingDedup

/** IVF ANN index/probe semantics + watermark-bounded streaming dedup. */
class IvfStreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("IVF with nprobe = nlist is exactly brute-force top-k") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val (assigned, cents) =
      Similarity.ivfIndex(emb, "vec_id", "embedding", dim = 64, nlist = 8)
    val ivf = Similarity.ivfTopK(assigned, cents, "vec_id", "embedding",
      q, "qvec", nprobe = 8, k = 20).collect().map(_.toSeq)
    val brute = Similarity.topK(emb, "vec_id", "embedding", q, "qvec", k = 20)
      .collect().map(_.toSeq)
    assert(ivf.toSeq === brute.toSeq)
  }

  test("IVF partial probe returns k rows whose sims are <= brute-force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val (assigned, cents) =
      Similarity.ivfIndex(emb, "vec_id", "embedding", dim = 64, nlist = 8)
    // every vector lands in exactly one cell
    assert(assigned.count() === emb.count())
    val probed = Similarity.ivfTopK(assigned, cents, "vec_id", "embedding",
      q, "qvec", nprobe = 2, k = 5).collect()
    assert(probed.length === 5)
    // a partial probe can never beat exact search, and its result list
    // is itself descending (approximation is in recall, not ordering)
    val bruteBest = Similarity.topK(emb, "vec_id", "embedding", q, "qvec", 1)
      .head().getDouble(1)
    assert(probed.forall(_.getDouble(1) <= bruteBest))
    val sims = probed.map(_.getDouble(1)).toSeq
    assert(sims === sims.sorted.reverse)
  }

  test("assignJoin (large-nlist path) row-identical to literal assign") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // centroids of the deterministic hash seeding (iters = 0: no Lloyd
    // pass, so the centroid table is identical for both paths)
    val (_, cents) =
      Similarity.ivfIndex(emb, "vec_id", "embedding", dim = 64, nlist = 8,
        iters = 0)
    val base = emb.select(col("vec_id"), col("embedding"))
    val lit = Similarity.assign(base, "vec_id", "embedding", cents)
      .select("vec_id", "__cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val joined = Similarity.assignJoin(base, "vec_id", "embedding", cents)
      .select("vec_id", "__cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(joined === lit) // same cells, including (sim, -cell) tie-break
    // the data-driven path keeps the zero-corpus-Exchange shape: the
    // corpus joins ONE broadcast row (nested-loop), never shuffles
    val plan = Similarity.assignJoin(base, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // and ivfIndex actually dispatches to it above the inline ceiling:
    // nlist = 512 > AssignInlineMaxNlist must still converge green
    val (assigned512, cents512) = Similarity.ivfIndex(
      emb.limit(200), "vec_id", "embedding", dim = 64, nlist = 512)
    assert(assigned512.count() === 200)
    assert(cents512.count() <= 512)
  }

  test("multi-probe LSH recall >= single-probe, both subsets of brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val dims = Seq(0, 7, 19, 33)
    val k = 10
    val brute = Similarity.topK(emb, "vec_id", "embedding", q, "qvec", k)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("vec_id").collect().map(_.getLong(0))
        .count(brute.contains).toDouble / k
    val single = recall(
      Similarity.annTopK(emb, "vec_id", "embedding", q, "qvec", dims, k))
    val multi = recall(
      Similarity.annTopKMultiProbe(emb, "vec_id", "embedding", q, "qvec", dims, k))
    assert(multi >= single)
    // the query vector itself is always in its own (probed) bucket
    assert(multi > 0.0)
  }

  test("streaming dedup suppresses within the horizon, evicts after it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val ts: Long => java.sql.Timestamp =
      m => new java.sql.Timestamp(1704067200000L + m * 60000L) // 2024-01-01 + m min
    val deduped = StreamingDedup.exact(
      input.toDF().toDF("key", "t"), "t", "10 minutes", Seq("key"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup").start()
    try {
      input.addData(("a", ts(0)), ("a", ts(1)), ("b", ts(0)))
      q.processAllAvailable()
      assert(spark.table("stream_dedup").count() === 2) // a, b
      // duplicate within the 10-min horizon: suppressed
      input.addData(("a", ts(5)))
      q.processAllAvailable()
      assert(spark.table("stream_dedup").count() === 2)
      // advance the watermark far past a's horizon, then repeat a
      input.addData(("c", ts(120)))
      q.processAllAvailable()
      input.addData(("a", ts(125)))
      q.processAllAvailable()
      val keys = spark.table("stream_dedup").select("key")
        .as[String].collect().sorted.toSeq
      assert(keys === Seq("a", "a", "b", "c")) // a re-emitted after eviction
    } finally q.stop()
  }

  test("streaming near-dup keep: first doc wins its buckets, near-dups dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ts: Long => java.sql.Timestamp =
      m => new java.sql.Timestamp(1704067200000L + m * 60000L)
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"tok$i").mkString(" ") + " tokX"
    val distinct = (1 to 40).map(i => s"other$i").mkString(" ")
    val kept = graft.streaming.StreamingDedup.nearDupKeep(
      input.toDF().toDF("doc_id", "text", "t"), "t", "10 minutes",
      "5 minutes", "doc_id", "text")
    val q = kept.writeStream.outputMode("append")
      .format("memory").queryName("stream_neardup").start()
    try {
      // batch 1: original + an unrelated doc, same window
      input.addData((1L, base, ts(0)), (2L, distinct, ts(1)))
      // batch 2: a near-duplicate of doc 1 inside the horizon, later window
      input.addData((3L, nearDup, ts(6)))
      // advance the watermark far enough to close all windows
      input.addData((9L, "closer doc far in the future", ts(60)))
      q.processAllAvailable()
      val ids = spark.table("stream_neardup").select("doc_id")
        .as[Long].collect().sorted.toSeq
      // doc 3 shares >= 1 band bucket with doc 1 (39/41 Jaccard ~ 0.95)
      // and must lose that claim; docs 1 and 2 keep all claims
      assert(ids === Seq(1L, 2L))
      // sanity: the near-dup pair really collides in >= 1 of the 8 bands
      import graft.dedup.Dedup
      val pairs = Dedup.minhashCandidates(
        Seq((1L, base), (3L, nearDup)).toDF("doc_id", "text"),
        "doc_id", "text", numHashes = 64, bands = 8)
      assert(pairs.count() >= 1)
    } finally q.stop()
  }

  test("streaming near-dup keep: same-batch near-dups resolve to the earliest") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ts: Long => java.sql.Timestamp =
      m => new java.sql.Timestamp(1704067200000L + m * 60000L)
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"tok$i").mkString(" ") + " tokX"
    val kept = graft.streaming.StreamingDedup.nearDupKeep(
      input.toDF().toDF("doc_id", "text", "t"), "t", "10 minutes",
      "5 minutes", "doc_id", "text")
    val q = kept.writeStream.outputMode("append")
      .format("memory").queryName("stream_neardup_batch").start()
    try {
      // BOTH near-dups in ONE micro-batch: an arbitrary within-batch
      // winner could split the shared buckets and drop both; the
      // deterministic claim store must keep exactly the earlier doc
      input.addData((1L, base, ts(0)), (3L, nearDup, ts(1)))
      input.addData((9L, "closer doc far in the future", ts(60)))
      q.processAllAvailable()
      val ids = spark.table("stream_neardup_batch").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L))
    } finally q.stop()
  }

  test("streaming near-dup keep == batch first-wins twin on real documents") {
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.Dedup
    // arrival order = doc_id (one doc per minute, all within the horizon)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
      .withColumn("t", expr("timestamp_millis(1704067200000 + doc_id * 60000)"))
    // batch twin = the GATE's replay function (min (ts,id) claims every
    // bucket; kept iff all bands won) over the same xx64 banding the
    // streaming operator computes — pinning nearDupKeepReplay itself to
    // the streaming semantics, not just an inline reimplementation
    val banded = docs
      .withColumn("__sig", Dedup.minhashSignature(Dedup.wordSet($"text"), 64))
      .withColumn("__bands", Dedup.bandHashes($"__sig", 8, 8))
      .select($"doc_id".as("id"), $"t".as("ts"),
        posexplode($"__bands").as(Seq("band", "bucket")))
    val expected = graft.streaming.StreamingDedup
      .nearDupKeepReplay(banded, bands = 8)
      .select("id").as[Long].collect().sorted.toSeq
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val kept = graft.streaming.StreamingDedup.nearDupKeep(
      input.toDF().toDF("doc_id", "text", "t"), "t", "2 hours",
      "1 minute", "doc_id", "text")
    val q = kept.writeStream.outputMode("append")
      .format("memory").queryName("stream_neardup_eq").start()
    try {
      val rows = docs.orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      rows.foreach { r => input.addData(r) } // one micro-batch per doc: strict arrival order
      q.processAllAvailable()
      // close every window
      input.addData((999999L, "window closer", new java.sql.Timestamp(
        rows.last._3.getTime + 10L * 3600 * 1000)))
      q.processAllAvailable()
      val got = spark.table("stream_neardup_eq").select("doc_id").as[Long]
        .collect().filter(_ != 999999L).sorted.toSeq
      assert(got === expected)
    } finally q.stop()
  }
}
