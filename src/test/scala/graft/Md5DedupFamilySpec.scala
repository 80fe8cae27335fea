package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** The md5-keyed replayable dedup family: deterministic coefficient
  * derivation, recall of exact duplicates, and agreement with the
  * exact-Jaccard oracle on the pairs it emits — at a NON-gate
  * (numHashes, bands) configuration so the parameterization is covered,
  * not just the single shape the CORRECTNESS gate replays in DuckDB. */
class Md5DedupFamilySpec extends SparkTestBase {
  private lazy val docs = queries.tbl(spark, sf, "documents")

  test("affine coefficients are deterministic and in range") {
    val c1 = Dedup.md5AffineCoeffs(64)
    val c2 = Dedup.md5AffineCoeffs(64)
    assert(c1 === c2)
    assert(c1.distinct.size === 64, "no repeated (a,b) draws")
    assert(c1.forall { case (a, b) =>
      a >= 1 && a < (1L << 30) && b >= 0 && b < Dedup.Md5P })
  }

  test("md5 minhash pairs: every emitted pair meets the threshold exactly") {
    val t = 0.8
    val pairs = Dedup.minhashNearDupsMd5(docs, "doc_id", "text",
      threshold = t, numHashes = 32, bands = 4).collect()
    val sets = docs.select(col("doc_id"), Dedup.wordSet(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, sb) = (sets(a).toSet, sets(b).toSet)
      val jac = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(jac >= t, s"pair ($a,$b) below threshold: $jac")
      assert(math.abs(r.getDouble(2) - math.floor(jac * 1000 + 0.5) / 1000)
        < 1e-9, s"reported jaccard off for ($a,$b)")
    }
  }

  test("md5 minhash keep: representatives are minimal over shared buckets") {
    val kept = Dedup.minhashRepresentativesMd5(docs, "doc_id", "text",
      numHashes = 32, bands = 8).collect()
    assert(kept.length === docs.count())
    kept.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0), "rep is never a larger id")
      assert(r.getBoolean(2) === (r.getLong(0) === r.getLong(1)))
    }
  }

  test("md5 minhash keep: null-text docs survive the decision grouped") {
    import spark.implicits._
    val withNulls = Seq((1L, "alpha beta gamma"), (2L, null),
      (3L, "alpha beta gamma"), (4L, null)).toDF("doc_id", "text")
    val kept = Dedup.minhashRepresentativesMd5(withNulls, "doc_id", "text",
        numHashes = 32, bands = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the sentinel digest's all-null fallback signature keeps null-text
    // docs in the output (inner-join on the exploded signature table
    // used to drop them) and groups them as exact duplicates
    assert(kept.keySet === Set(1L, 2L, 3L, 4L),
      "every doc, null-text included, gets a keep/drop decision")
    assert(kept(2L) === 2L && kept(4L) === 2L,
      "null-text docs form one group represented by their min id")
    assert(kept(3L) === 1L)
  }

  test("incremental near-dup == banded brute force on the corpus split") {
    val batch = docs.filter(col("doc_id") >= 250)
    val index = docs.filter(col("doc_id") < 250)
    val t = 0.8
    val got = Dedup.incrementalNearDupMd5(batch, index, "doc_id", "text", t)
    // expected: band-bucket candidates (same md5 family), brute-verified
    // on the word sets, aggregated to (min index id, max jaccard)
    val bb = Dedup.md5BandedDocs(batch, "doc_id", "text")
      .toDF("bid", "band", "bucket")
    val ib = Dedup.md5BandedDocs(index, "doc_id", "text")
      .toDF("iid", "band", "bucket")
    val bSets = batch.select(col("doc_id").as("bid"),
      Dedup.wordSet(col("text")).as("bs"))
    val iSets = index.select(col("doc_id").as("iid"),
      Dedup.wordSet(col("text")).as("is"))
    val jraw = size(array_intersect(col("bs"), col("is"))).cast("double") /
      size(array_union(col("bs"), col("is")))
    val ver = bb.join(ib, Seq("band", "bucket"))
      .select("bid", "iid").distinct()
      .join(bSets, Seq("bid")).join(iSets, Seq("iid"))
      .filter(jraw >= t)
      .groupBy("bid")
      .agg(min("iid").as("dup_of_index"), max(round(jraw, 3)).as("best_jaccard"))
    val want = batch.select(col("doc_id"))
      .join(ver, col("doc_id") === col("bid"), "left")
      .select(col("doc_id"), col("dup_of_index"), col("best_jaccard"),
        col("dup_of_index").isNull.as("keep"))
    assert(got.exceptAll(want).count() === 0L, "operator-only rows")
    assert(want.exceptAll(got).count() === 0L, "brute-only rows")
    // the decision is doing real work: both outcomes occur
    val kept = got.filter(col("keep")).count()
    assert(kept > 0 && kept < batch.count())
  }

  test("incremental near-dup: null-text docs admit against the sentinel") {
    import spark.implicits._
    val index = Seq((1L, "alpha beta gamma"), (2L, null))
      .toDF("doc_id", "text")
    val batch = Seq((10L, null.asInstanceOf[String]),
      (11L, "omega psi chi"), (12L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDupMd5(batch, index, "doc_id", "text", 0.8)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(3)))
      .toMap
    assert(got === Map(
      10L -> (Some(2L), false), // sentinel group matches the index's null doc
      11L -> (None, true),
      12L -> (Some(1L), false)))
  }

  test("corpus overlap: identity, disjointness, and estimator accuracy") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta")).toDF("doc_id", "text")
    val b = Seq((3L, "omega psi chi phi")).toDF("doc_id", "text")
    // identical corpora: every signature component agrees, jaccard 1.0
    val same = Dedup.corpusOverlapMd5(a, a, "text").head()
    assert(same.getInt(0) === 64)
    assert(same.getDouble(1) === 1.0 && same.getDouble(2) === 1.0)
    // disjoint vocabularies: exact 0; the estimate can only collide by
    // md5 accident (none on these words)
    val disj = Dedup.corpusOverlapMd5(a, b, "text").head()
    assert(disj.getDouble(2) === 0.0)
    assert(disj.getDouble(1) === 0.0)
    // real corpora: the 64-hash estimate lands near the exact overlap
    // (binomial std ~ sqrt(J(1-J)/64) <= 0.063; 0.2 is > 3 sigma)
    val d = queries.tbl(spark, sf, "documents")
    val r = Dedup.corpusOverlapMd5(d.filter(col("source") === "src0"),
      d.filter(col("source") === "src1"), "text").head()
    assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 0.2,
      s"estimate ${r.getDouble(1)} vs exact ${r.getDouble(2)}")
  }

  test("md5 simhash: exact duplicates collide at hamming 0") {
    val dup = docs.limit(5).union(docs.limit(5)) // force exact dups
      .withColumn("doc_id", monotonically_increasing_id())
    val pairs = Dedup.simhashNearDupsMd5(dup, "doc_id", "text",
      maxHamming = 0)
    assert(pairs.filter(col("hamming") === 0).count() >= 5)
    // and the simhash is a pure function of the text
    val h = Dedup.simhashMd5(docs.limit(20), "doc_id", "text")
    val h2 = Dedup.simhashMd5(docs.limit(20), "doc_id", "text")
    assert(h.exceptAll(h2).count() === 0L)
  }
}
