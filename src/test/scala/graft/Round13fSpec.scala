package graft

import org.apache.spark.sql.functions._
import graft.dedup.{NgramSpans, SortedNeighborhood}
import graft.similarity.{ScalarQuantizer, Similarity}

/** Round-13f semantic pins: n-gram span semantics (cross-doc only,
  * island merging), sorted-neighborhood window/block behavior, and the
  * SQ8 quantization error bound + retrieval identity. */
class Round13fSpec extends SparkTestBase {
  import spark.implicits._

  test("NgramSpans: runs of shared grams merge into one maximal span") {
    // docs 1 and 2 share tokens 0..4 (two overlapping 4-grams each)
    val df = Seq(
      (1L, "a b c d e x1 y1 z1 w1"),
      (2L, "a b c d e x2 y2 z2 w2"),
      (3L, "p q r s t u v w x")).toDF("doc_id", "text")
    val sp = NgramSpans.spans(df, "doc_id", "text", 4)
      .orderBy("doc_id", "span_start").collect()
    assert(sp.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ===
      Seq((1L, 0L, 4L, 5L), (2L, 0L, 4L, 5L)))
  }

  test("NgramSpans: within-doc repetition alone is NOT a cross-doc span") {
    val df = Seq(
      (1L, "m m m m m m m m"),
      (2L, "totally different words here indeed")).toDF("doc_id", "text")
    assert(NgramSpans.spans(df, "doc_id", "text", 4).count() === 0)
  }

  test("NgramSpans: disjoint shared regions stay separate spans") {
    // shared prefix and shared suffix with a unique middle (gap > 1)
    val df = Seq(
      (1L, "a b c d G1 G2 G3 w x y z"),
      (2L, "a b c d H1 H2 H3 w x y z")).toDF("doc_id", "text")
    val sp = NgramSpans.spans(df, "doc_id", "text", 4)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sp.toSeq === Seq((1L, 0L, 3L), (1L, 7L, 10L),
      (2L, 0L, 3L), (2L, 7L, 10L)))
  }

  test("NgramSpans.coverage reports 0 for clean docs, fraction for dups") {
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d zz yy xx ww"),
      (3L, "unrelated text entirely here now")).toDF("doc_id", "text")
    val cov = NgramSpans.coverage(df, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    assert(cov(0).getLong(2) === 4L && cov(0).getDouble(3) === 0.5)
    assert(cov(1).getLong(2) === 4L)
    assert(cov(2).getLong(2) === 0L && cov(2).getDouble(3) === 0.0)
  }

  test("SortedNeighborhood pairs only within the window and block") {
    // same block 'k': four sorted rows; w=3 pairs ranks (1,2),(1,3),
    // (2,3),(2,4),(3,4) — never (1,4); 'q ...' is another block
    val df = Seq(
      (1L, "k a a a"), (2L, "k a a b"), (3L, "k a b b"),
      (4L, "k b b b"), (5L, "q a a a")).toDF("doc_id", "text")
    val first = element_at(split(trim(col("text")), "\\s+"), 1)
    val pairs = SortedNeighborhood.pairs(df, "doc_id", "text", first,
      trim(col("text")), window = 3, minJaccard = 0.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
  }

  test("SortedNeighborhood: identical neighbors score jaccard 1.0") {
    val df = Seq((1L, "x y z"), (2L, "x y z"), (3L, "x y q"))
      .toDF("doc_id", "text")
    val first = element_at(split(trim(col("text")), "\\s+"), 1)
    val top = SortedNeighborhood.pairs(df, "doc_id", "text", first,
      trim(col("text")), 3, 0.9).collect()
    assert(top.length === 1 && top.head.getDouble(2) === 1.0)
  }

  test("ScalarQuantizer: round-trip error <= step/2, codes in range") {
    val emb = queries.tbl(spark, sf, "embeddings")
    val model = ScalarQuantizer.fit(emb, "embedding", 64)
    val enc = ScalarQuantizer.encode(emb, "vec_id", "embedding", model)
    val joined = enc.join(emb, "vec_id")
      .select(col("codes"),
        ScalarQuantizer.dequant(col("codes"), model).as("dq"),
        Similarity.toVec(col("embedding")).as("v"))
    val maxErrByDim = joined.select(posexplode(
        zip_with(col("dq"), col("v"), (a, b) => abs(a - b))))
      .toDF("d", "err").groupBy("d").agg(max("err").as("e"))
      .orderBy("d").collect().map(r => (r.getInt(0), r.getDouble(1)))
    val steps = model.steps
    assert(maxErrByDim.forall { case (d, e) => e <= steps(d) / 2 + 1e-9 })
    val bad = joined.select(explode(col("codes")).as("c"))
      .where(col("c") < 0 || col("c") > 255).count()
    assert(bad === 0L)
  }

  test("ScalarQuantizer: constant dimension encodes 0, dequants exactly") {
    val df = Seq((1L, Seq(3.0, 1.0)), (2L, Seq(3.0, 2.0)))
      .toDF("id", "vec")
    val m = ScalarQuantizer.fit(df, "vec", 2)
    assert(m.steps.head === 0.0)
    val enc = ScalarQuantizer.encode(df, "id", "vec", m)
    val r = enc.select(ScalarQuantizer.dequant(col("codes"), m))
      .as[Seq[Double]].collect()
    assert(r.forall(_.head === 3.0))
  }

  test("sqRescoreTopK with pool headroom is brute-force identity") {
    val emb = queries.tbl(spark, sf, "embeddings")
    val qv = emb.filter(col("vec_id") === 1)
      .select(Similarity.toVec(col("embedding")))
      .head().getSeq[Double](0)
    val model = ScalarQuantizer.fit(emb, "embedding", 64)
    val enc = ScalarQuantizer.encode(emb, "vec_id", "embedding", model)
    val got = ScalarQuantizer.sqRescoreTopK(enc, emb, "vec_id",
      "embedding", model, qv, 300, 10)
      .select("vec_id").as[Long].collect().toSeq
    val want = Similarity.topK(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") === 1)
        .select(Similarity.toVec(col("embedding")).as("q")), "q", 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(got === want)
  }
}
