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
}
