package graft

import org.apache.spark.sql.functions._
import graft.similarity.{ProductQuantizer, Similarity}

/** Product quantizer: code validity, deterministic training, the
  * full-pool == brute-force identity, and the ADC scan's plan shape. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = queries.tbl(spark, sf, "embeddings")
  private lazy val model =
    ProductQuantizer.fit(emb, "vec_id", "embedding", dim = 64, m = 8,
      ksub = 16, iters = 1)

  test("codes are m valid codebook indices per vector") {
    val enc = ProductQuantizer.encode(emb, "vec_id", "embedding", model)
    val bad = enc.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad === 0)
    assert(enc.count() === emb.count())
  }

  test("training is deterministic (hash seeding, no rand)") {
    val again = ProductQuantizer.fit(emb, "vec_id", "embedding", dim = 64,
      m = 8, ksub = 16, iters = 1)
    assert(again.books === model.books)
  }

  test("full candidate pool degenerates to exact brute-force top-k") {
    val qv = emb.filter(col("vec_id") === 0)
      .select(Similarity.toVec(col("embedding"))).head().getSeq[Double](0)
    val n = emb.count().toInt
    val enc = ProductQuantizer.encode(emb, "vec_id", "embedding", model)
    val got = ProductQuantizer.adcRescoreTopK(enc, emb, "vec_id",
      "embedding", model, qv, candidates = n, k = 10)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    val exact = emb
      .select(col("vec_id"),
        round(Similarity.cosine(Similarity.toVec(col("embedding")),
          typedLit(qv)), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .as[(Long, Double)].collect()
    assert(got.toSeq === exact.toSeq)
  }

  test("ADC coarse scan is a pure map + TakeOrderedAndProject") {
    val qv = emb.filter(col("vec_id") === 0)
      .select(Similarity.toVec(col("embedding"))).head().getSeq[Double](0)
    val enc = ProductQuantizer.encode(emb, "vec_id", "embedding", model)
    // replicate the pool stage's shape: approx score + ordered limit
    val subDim = model.subDim
    val luts = model.books.zipWithIndex.map { case (book, s) =>
      val q = qv.slice(s * subDim, (s + 1) * subDim)
      book.map(c => c.iterator.zip(q.iterator).map(t => t._1 * t._2).sum)
    }
    val approx = luts.zipWithIndex.map { case (lut, s) =>
      element_at(typedLit(lut), col("codes")(s) + 1)
    }.reduce(_ + _)
    val p = enc.select(col("vec_id"), approx.as("__adc"))
      .orderBy(col("__adc").desc, col("vec_id")).limit(50)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"coarse scan must local-top-k, not global sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Exchange hashpartitioning"),
      s"coarse scan must not shuffle:\n$p")
  }
}
