package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** VALUE oracles for the gates the driver can only row-count (DuckDB has
  * no xxhash64): each hash-based dedup operator is replayed against an
  * implementation-independent exact form on the same corpus, and the
  * outputs must match row-for-row. A silent kernel change that preserves
  * row counts (the driver's blind spot) fails here.
  *
  * Independence argument:
  *  - `dedup_minhash_pairs` ∩ {|id_a-id_b| <= W} vs `jaccardPairsWindowed`
  *    (W, t): the right side never touches MinHash — only
  *    array_intersect/array_union — so signature, banding, and the fused
  *    join condition are all under test. MinHash may legitimately MISS a
  *    boundary pair (at J=0.9 a band of 8 rows collides with p=0.9^8 ≈
  *    0.43), so the contract is: zero false positives with exact jaccard
  *    values, plus the deterministic miss set pinned as a golden — every
  *    miss sits exactly at the 0.9 boundary. A kernel change that alters
  *    signatures or banding reshuffles which boundary pairs collide and
  *    breaks the pin; one that loosens verification breaks soundness.
  *  - `dedup_simhash_pairs` vs a brute-force all-pairs oracle whose
  *    simhash comes from the SQL-lambda composable form (not the codegen
  *    [[graft.functions.SimHash64]]) and whose blocking/hamming are
  *    recomputed from scratch.
  */
class InternalOracleSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text")

  test("minhash near-dup pairs match the exact-Jaccard oracle on an id window") {
    val w = 25
    // the gate's exact configuration (Extensions: t=0.9, 64 hashes, 8 bands)
    val lhs = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.9, numHashes = 64, bands = 8)
      .filter(col("doc_id_b") <= col("doc_id_a") + w)
      .select(col("doc_id_a").as("id_a"), col("doc_id_b").as("id_b"),
        col("jaccard"))
    val rhs = Dedup.jaccardPairsWindowed(docs, "doc_id", "text", w, 0.9)
    assert(lhs.count() === 1076L, "window must exercise the full pair set")
    assert(lhs.exceptAll(rhs).count() === 0L,
      "minhash pairs the exact oracle lacks (false positives or wrong jaccard)")
    // golden recall pin: the only exact pairs LSH misses on this corpus,
    // all at jaccard == the 0.9 boundary (band collision p = 0.9^8)
    val expectedMisses = Seq(
      (10L, 34L, 0.9), (10L, 35L, 0.9), (208L, 223L, 0.9),
      (215L, 223L, 0.9), (218L, 223L, 0.9), (223L, 245L, 0.9),
      (393L, 411L, 0.9), (394L, 411L, 0.9), (420L, 441L, 0.9),
      (423L, 441L, 0.933), (441L, 446L, 0.9))
    val misses = rhs.exceptAll(lhs).orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(misses === expectedMisses,
      "the deterministic LSH miss set changed — the kernel changed")
  }

  /** SimHash via the SQL-lambda form — deliberately NOT the codegen
    * expression under test (same contract as SimHash64Spec.composable). */
  private def slowSimhash = {
    val votes = expr(
      """aggregate(
           transform(split(trim(text), '\\s+'), w -> xxhash64(w)),
           array_repeat(0L, 64),
           (acc, h) -> zip_with(acc,
             transform(sequence(0, 63), i -> IF(((h >> i) & 1) = 1, 1L, -1L)),
             (a, b) -> a + b))""")
    (0 until 64).map { i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("simhash blocked pairs match a from-scratch brute-force oracle") {
    val hashed = docs.select(col("doc_id"), slowSimhash.as("sh"))
      .withColumn("blk", shiftrightunsigned(col("sh"), 48))
    val a = hashed.toDF("doc_id_a", "sh_a", "blk_a")
    val b = hashed.toDF("doc_id_b", "sh_b", "blk_b")
    // brute force: every same-block ordered pair, hamming recomputed
    val oracle = a.crossJoin(b)
      .filter(col("doc_id_a") < col("doc_id_b") && col("blk_a") === col("blk_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= 16)
      .select("doc_id_a", "doc_id_b", "hamming")
    val got = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 16)
    assert(got.count() > 0, "oracle must exercise real pairs")
    assert(got.exceptAll(oracle).count() === 0L, "pairs the oracle lacks")
    assert(oracle.exceptAll(got).count() === 0L, "pairs simhashNearDups missed")
  }

  test("minhash representatives match a doc-level min-over-shared-bucket oracle") {
    // The gate's exact configuration (64 hashes, 8 bands). The oracle is
    // built from scratch at DOC level: slow composable signatures (no
    // MinHashSignature expression), inline band hashes, and rep(doc) =
    // min doc_id over every doc sharing >= 1 (band, bucket) — no digest
    // collapse, no groupBy+join-back optimization. Pins that the
    // production operator's collapsed form computes the naive answer.
    val numHashes = 64
    val bands = 8
    val rows = numHashes / bands
    val slowSig = array((0 until numHashes).map { i =>
      array_min(transform(array_distinct(split(trim(col("text")), "\\s+")),
        x => xxhash64(x, lit(i))))
    }: _*)
    val banded = docs
      .withColumn("__sig", slowSig)
      .select(col("doc_id"), posexplode(array((0 until bands).map { b =>
        xxhash64(array_join(slice(col("__sig"), b * rows + 1, rows), "_"), lit(b))
      }: _*)).as(Seq("band", "bucket")))
    val a = banded.toDF("doc_id", "band", "bucket")
    val b = banded.toDF("nbr", "band_b", "bucket_b")
    val oracle = a.join(b, col("band") === col("band_b")
        && col("bucket") === col("bucket_b"))
      .groupBy("doc_id").agg(min("nbr").as("rep_id"))
      .select(col("doc_id"), col("rep_id"),
        (col("doc_id") === col("rep_id")).as("is_kept"))
    val got = Dedup.minhashRepresentatives(docs, "doc_id", "text",
      numHashes, bands)
    assert(got.count() === docs.count(), "one decision row per document")
    assert(got.exceptAll(oracle).count() === 0L,
      "rows the doc-level oracle lacks (collapsed rep computation diverged)")
    assert(oracle.exceptAll(got).count() === 0L,
      "rows minhashRepresentatives missed")
  }

  test("simhash gate column (doc_id, simhash, block) matches the slow form") {
    val got = Dedup.withSimHash(docs, "text", "simhash")
      .select(col("doc_id"), col("simhash"),
        shiftrightunsigned(col("simhash"), 48).as("block"))
    val oracle = docs.select(col("doc_id"), slowSimhash.as("simhash"))
      .withColumn("block", shiftrightunsigned(col("simhash"), 48))
    assert(got.exceptAll(oracle).count() === 0L)
    assert(oracle.exceptAll(got).count() === 0L)
  }
}
