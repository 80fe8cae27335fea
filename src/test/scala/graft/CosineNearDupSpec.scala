package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Value oracle + scale-shape checks for the banded multi-table sign-LSH
  * cosine near-dup operator (the `dedup_cosine_pairs` gate path).
  *
  * The brute-force oracle is built FROM SCRATCH in this file: band
  * buckets from inline when/otherwise sums (not [[Similarity.lshBucket]]),
  * cosine from the SQL-lambda HOF form (not the codegen DotProduct), the
  * any-band collision as a plain OR chain over an all-pairs cross join —
  * so the banding, digest collapse, FirstEqualIndex dedup, and fused
  * verification of the production operator are all genuinely under test.
  */
class CosineNearDupSpec extends SparkTestBase {

  private val bandDims = Similarity.signBandDims(bands = 4, bitsPerBand = 6, dim = 64)
  private val threshold = 0.3

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")

  /** From-scratch bucket of one band (inline, no Similarity helpers). */
  private def rawBucket(vec: org.apache.spark.sql.Column, dims: Seq[Int]) =
    dims.zipWithIndex.map { case (d, i) =>
      when(element_at(vec, d + 1) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("banded pairs match a from-scratch all-pairs oracle (both directions)") {
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val withBuckets = bandDims.zipWithIndex.foldLeft(v) { case (df, (ds, i)) =>
      df.withColumn(s"b$i", rawBucket(col("v"), ds))
    }
    val a = withBuckets.toDF("id_a" +: "v_a" +: bandDims.indices.map(i => s"ba$i"): _*)
    val b = withBuckets.toDF("id_b" +: "v_b" +: bandDims.indices.map(i => s"bb$i"): _*)
    val anyBand = bandDims.indices.map(i => col(s"ba$i") === col(s"bb$i"))
      .reduce(_ || _)
    val oracle = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") && anyBand)
      .withColumn("sim", round(hofCosine(col("v_a"), col("v_b")), 4))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")

    val got = Similarity.cosineNearDups(emb, "vec_id", "embedding",
        threshold, bandDims)
      .select(col("vec_id_a").as("id_a"), col("vec_id_b").as("id_b"), col("sim"))

    assert(got.count() > 0, "oracle must exercise real pairs")
    assert(got.exceptAll(oracle).count() === 0L,
      "pairs the brute-force oracle lacks (false positives or wrong sim)")
    assert(oracle.exceptAll(got).count() === 0L,
      "pairs the banded operator missed (banding or dedup dropped a collision)")
  }

  test("digest collapse: candidates invariant under exact replication") {
    val baseCands = Similarity.cosineCandidates(emb, "vec_id", "embedding", bandDims)
      .count()
    // 3x replication, fresh ids, identical vectors — the duplicate-heavy
    // regime: candidate work must NOT grow (unique-vector collapse)
    val hi = emb.agg(max("vec_id")).head().getLong(0) + 1L
    val replicated = (0 until 3).map(i =>
      emb.select((col("vec_id") + lit(i * hi)).as("vec_id"), col("embedding")))
      .reduce(_ unionAll _)
    val repCands = Similarity.cosineCandidates(replicated, "vec_id", "embedding", bandDims)
      .count()
    assert(repCands === baseCands,
      s"candidate count grew under replication ($baseCands -> $repCands): " +
        "digest collapse is broken")
    // ...while the PAIR output does gain the within-digest duplicates
    val basePairs = Similarity.cosineNearDups(emb, "vec_id", "embedding",
      threshold, bandDims).count()
    val repPairs = Similarity.cosineNearDups(replicated, "vec_id", "embedding",
      threshold, bandDims).count()
    assert(repPairs > basePairs, "replication must surface duplicate pairs")
  }

  test("replicated corpus pairs: every original pair appears 9x + exact-dup pairs") {
    val n = emb.count()
    val basePairs = Similarity.cosineNearDups(emb, "vec_id", "embedding",
      threshold, bandDims)
    val base = basePairs.count()
    // random 64-dim vectors: no exact duplicates and no rounded-1.0 pairs
    // in the base corpus (precondition of the algebra below)
    assert(basePairs.filter(col("sim") === 1.0).count() === 0L)
    val hi = emb.agg(max("vec_id")).head().getLong(0) + 1L
    val replicated = (0 until 3).map(i =>
      emb.select((col("vec_id") + lit(i * hi)).as("vec_id"), col("embedding")))
      .reduce(_ unionAll _)
    val rep = Similarity.cosineNearDups(replicated, "vec_id", "embedding",
      threshold, bandDims).count()
    // each cross-digest pair expands 3x3; each vector's 3 identical
    // copies add C(3,2)=3 within-digest pairs at sim 1.0
    assert(rep === 9 * base + 3 * n, "replicated pair algebra mismatch")
  }

  test("signBandPlanFor scales bits with corpus size and caps at dim/bands") {
    def bits(plan: Seq[Seq[Int]]) = plan.head.size
    val small = Similarity.signBandPlanFor(1000, 64, bands = 4, targetOccupancy = 64)
    val mid = Similarity.signBandPlanFor(100000, 64, bands = 4, targetOccupancy = 64)
    val big = Similarity.signBandPlanFor(100000000L, 64, bands = 4, targetOccupancy = 64)
    assert(bits(small) === 4) // floor
    assert(bits(mid) > bits(small), "bits must grow with corpus size")
    assert(bits(big) === 16, "capped at dim/bands")
    assert(big.flatten.distinct.size === big.flatten.size,
      "bands must use disjoint hyperplane dims")
  }
}
