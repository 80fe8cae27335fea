package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.Analytics

/** Edge cases (empty/degenerate inputs) and ScalaCheck properties for
  * the round-7 analytics operators — the failure modes gates over
  * well-formed corpora never exercise. */
class AnalyticsEdgeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val empty =
    Seq.empty[(String, Double, Long)].toDF("grp", "v", "id")

  test("round-8 edges: constant-group winsorize, split guards, overlap") {
    import graft.dedup.Dedup
    import graft.operators.DeterministicSplit
    // constant group: every percentile equals the constant, nothing moves
    val const = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0)).toDF("grp", "v")
    val w = Analytics.winsorize(const, Seq("grp"), "v", 0.01, 0.99)
    assert(w.filter(col("clipped") =!= col("v")).count() === 0)
    // split weight validation fails loudly
    val rows = Seq((1L, 1.0)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      DeterministicSplit(rows, Seq("id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      DeterministicSplit(rows, Seq("id"), Seq("only" -> 1.0))
    }
    // corpus overlap of a corpus with itself is exactly 1.0 even when
    // tiny; against an empty corpus the exact jaccard is 0 and the
    // estimate never reports a false match (null-signature side)
    val a = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val self = Dedup.corpusOverlapMd5(a, a, "text").head()
    assert(self.getInt(0) === 64 && self.getDouble(2) === 1.0)
    val vsEmpty = Dedup.corpusOverlapMd5(a, emptyDocs, "text").head()
    assert(vsEmpty.getDouble(2) === 0.0,
      s"empty side must yield zero exact overlap, got $vsEmpty")
  }

  test("empty inputs: stats, mode, top-k, histogram, funnel, checksum") {
    assert(Analytics.saltedStats(empty, Seq("grp"), "v", Seq("id"), 8)
      .count() === 0)
    assert(Analytics.modePerGroup(empty, Seq("grp"), "v").count() === 0)
    assert(Analytics.topKPerGroup(empty, Seq("grp"), "v", 3, Seq("id"),
      salts = 4).count() === 0)
    assert(Analytics.histogram(empty, "v", 0.0, 10.0).count() === 0)
    val f = Analytics.funnel(
      Seq.empty[(Long, String, Long)].toDF("u", "t", "ts"),
      "u", "t", "ts", Seq("a", "b"))
      .orderBy("step_idx").select("n_users").as[Long].collect()
    assert(f.toSeq === Seq(0L, 0L), "empty stream still emits zero rows")
    val ck = Analytics.tableChecksum(empty, Seq("grp", "v")).head()
    assert(ck.getLong(0) === 0L && ck.isNullAt(1),
      "empty checksum: zero rows, null sum (SQL sum-of-nothing)")
  }

  test("degenerate stats: single row, all-identical values") {
    val one = Seq(("g", 5.0, 1L)).toDF("grp", "v", "id")
    val s = Analytics.saltedStats(one, Seq("grp"), "v", Seq("id"), 8)
      .select("n", "v_min", "v_max", "v_avg")
      .as[(Long, Double, Double, Double)].head()
    assert(s === ((1L, 5.0, 5.0, 5.0)))
    // stddev of identical values is 0 -> z division yields null -> no
    // outliers, NOT a crash or a spurious all-rows result
    val same = Seq(("g", 2.0, 1L), ("g", 2.0, 2L), ("g", 2.0, 3L))
      .toDF("grp", "v", "id")
    assert(Analytics.zscoreOutliers(same, Seq("grp"), "v", 0.1)
      .count() === 0)
    assert(Analytics.madStats(same, Seq("grp"), "v")
      .select("med", "mad").as[(Double, Double)].head() === ((2.0, 0.0)))
  }

  test("grid: top-k semilattice holds across k, salts, and group skew") {
    for (n <- Seq(1, 7, 80); k <- Seq(1, 3, 10); salts <- Seq(2, 16)) {
      val df = (0 until n).map(i =>
        ((i % 3).toString, (i * 7919 % 100).toDouble, i.toLong))
        .toDF("grp", "v", "id")
      val plain = Analytics.topKPerGroup(df, Seq("grp"), "v", k, Seq("id"))
        .select("grp", "id", "rk").orderBy("grp", "rk")
        .as[(String, Long, Int)].collect().toSeq
      val salted = Analytics.topKPerGroup(df, Seq("grp"), "v", k, Seq("id"),
        salts).select("grp", "id", "rk").orderBy("grp", "rk")
        .as[(String, Long, Int)].collect().toSeq
      assert(salted === plain, s"n=$n k=$k salts=$salts")
    }
  }

  test("PQ on a corpus smaller than ksub still encodes and retrieves") {
    import graft.similarity.{ProductQuantizer, Similarity}
    val tiny = queries.tbl(spark, sf, "embeddings").limit(5)
    val model = ProductQuantizer.fit(tiny, "vec_id", "embedding", 64,
      m = 8, ksub = 16, iters = 1)
    val enc = ProductQuantizer.encode(tiny, "vec_id", "embedding", model)
    assert(enc.count() === 5)
    val qv = tiny.orderBy("vec_id")
      .select(Similarity.toVec(col("embedding"))).head().getSeq[Double](0)
    val got = ProductQuantizer.adcRescoreTopK(enc, tiny, "vec_id",
      "embedding", model, qv, candidates = 5, k = 3)
    assert(got.count() === 3)
  }
}

/** ScalaCheck properties for the pure CharEntropy kernel. */
object CharEntropyProps extends Properties("CharEntropy") {
  import org.apache.spark.unsafe.types.UTF8String

  property("bounded by [0, ln(distinct)]") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)) { s =>
      val h = graft.functions.CharEntropy.compute(UTF8String.fromString(s))
      h >= 0.0 && h <= math.log(s.distinct.length.toDouble) + 1e-4
    }

  property("uniform text maximizes; repeated single char scores 0") =
    forAll(Gen.choose(1, 200)) { n =>
      graft.functions.CharEntropy.compute(
        UTF8String.fromString("z" * n)) == 0.0
    }

  property("permutation-invariant (bag-of-chars statistic)") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumChar)) { cs =>
      val a = graft.functions.CharEntropy.compute(
        UTF8String.fromString(cs.mkString))
      val b = graft.functions.CharEntropy.compute(
        UTF8String.fromString(scala.util.Random.javaRandomToRandom(
          new java.util.Random(42)).shuffle(cs).mkString))
      a == b
    }
}
