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

  test("NearestCode kernel matches the struct-greatest reference form") {
    // the composable formulation the native kernel replaced — kept
    // here as the executable semantics contract (incl. smaller-code
    // tie-breaking)
    def refArgmin(sv: org.apache.spark.sql.Column,
                  book: Seq[Seq[Double]]): org.apache.spark.sql.Column = {
      def sqDist(c: Seq[Double]) =
        aggregate(zip_with(sv, typedLit(c), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d)
      val scored = book.zipWithIndex.map { case (c, code) =>
        struct((-sqDist(c)).as("nd"), lit(-code).as("nc"))
      }
      (-greatest(scored: _*).getField("nc")).cast("int")
    }
    val book = Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(1.0, 1.0),
      Seq(-2.0, 3.0)) // rows 1 and 2 identical: tie must pick code 1
    val pts = Seq(Seq(0.1, -0.2), Seq(0.9, 1.2), Seq(1.0, 1.0),
      Seq(-1.5, 2.5), Seq(0.5, 0.5)).toDF("v")
    val got = pts.select(
        graft.functions.NearestCode.nearest(col("v"), book).as("k"),
        refArgmin(col("v"), book).as("r"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1),
      s"kernel ${r.getInt(0)} vs reference ${r.getInt(1)}"))
    assert(got(2).getInt(0) === 1, "exact tie keeps the smaller code")
    // and on real vectors: interpreted eval (no codegen) agrees too
    val emb8 = emb.select(col("vec_id"),
      slice(graft.similarity.Similarity.toVec(col("embedding")), 1, 2)
        .as("v"))
    val wide = emb8.select(
      graft.functions.NearestCode.nearest(col("v"), book).as("k"),
      refArgmin(col("v"), book).as("r"))
    assert(wide.filter(col("k") =!= col("r")).count() === 0)
  }

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

  test("multi-iteration training converges and replays bit-identically") {
    // each Lloyd pass re-roots the plan at the subvector scan with the
    // codebooks as driver-collected literals, so iteration depth never
    // grows lineage — the converged model must be exactly reproducible
    val m3 = ProductQuantizer.fit(emb, "vec_id", "embedding", dim = 64,
      m = 4, ksub = 8, iters = 3)
    val m3b = ProductQuantizer.fit(emb, "vec_id", "embedding", dim = 64,
      m = 4, ksub = 8, iters = 3)
    assert(m3b.books === m3.books,
      "3-iteration codebooks must replay bit-identically")
    // Lloyd's invariant: quantization SSE is non-increasing per pass
    def sse(mod: ProductQuantizer.Model): Double = {
      val enc = ProductQuantizer.encode(emb, "vec_id", "embedding", mod)
      val subDim = mod.subDim
      val terms = mod.books.zipWithIndex.map { case (book, s) =>
        val sv = slice(Similarity.toVec(col("embedding")),
          s * subDim + 1, subDim)
        val cent = element_at(typedLit(book), col("codes")(s) + 1)
        aggregate(zip_with(sv, cent, (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, d) => a + d)
      }
      enc.select(terms.reduce(_ + _).as("e"))
        .agg(sum("e")).head().getDouble(0)
    }
    val sses = (0 to 3).map(i => sse(ProductQuantizer.fit(
      emb, "vec_id", "embedding", dim = 64, m = 4, ksub = 8, iters = i)))
    sses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"SSE must not increase across passes: $sses")
    }
    assert(sses.last < sses.head,
      s"three passes must actually improve on the hash seeding: $sses")
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

  test("IVFADC with nprobe = nlist and full pool is exact brute force") {
    val qv = emb.filter(col("vec_id") === 0)
      .select(Similarity.toVec(col("embedding"))).head().getSeq[Double](0)
    val n = emb.count().toInt
    val (assigned, cents) = Similarity.ivfIndex(emb, "vec_id", "embedding",
      dim = 64, nlist = 8, iters = 1)
    val enc = ProductQuantizer.encode(assigned, "vec_id", "embedding", model)
    val got = ProductQuantizer.ivfAdcTopK(enc, cents, emb, "vec_id",
      "embedding", model, qv, nprobe = 8, candidates = n, k = 10)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    val exact = emb
      .select(col("vec_id"),
        round(Similarity.cosine(Similarity.toVec(col("embedding")),
          typedLit(qv)), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .as[(Long, Double)].collect()
    assert(got.toSeq === exact.toSeq)
    // partial probe: k rows, none better than exact best, still ranked
    val partial = ProductQuantizer.ivfAdcTopK(enc, cents, emb, "vec_id",
      "embedding", model, qv, nprobe = 2, candidates = 100, k = 5)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(partial.length === 5)
    assert(partial.forall(_._2 <= exact.head._2))
    assert(partial.map(_._2).toSeq === partial.map(_._2).sorted.reverse.toSeq)
  }

  test("IVFADC probe over a __cell-partitioned store is partition-pruned") {
    val qv = emb.filter(col("vec_id") === 0)
      .select(Similarity.toVec(col("embedding"))).head().getSeq[Double](0)
    val (assigned, cents) = Similarity.ivfIndex(emb, "vec_id", "embedding",
      dim = 64, nlist = 8, iters = 1)
    val enc = ProductQuantizer.encode(assigned, "vec_id", "embedding", model)
      .select("vec_id", "__cell", "codes")
    val out = java.nio.file.Files.createTempDirectory("ivfadc-store").toString
    enc.write.mode("overwrite").partitionBy("__cell").parquet(out)
    val store = spark.read.parquet(out)
    val nCells = enc.select("__cell").distinct().count()
    assert(nCells >= 3, s"need a multi-cell index, got $nCells")
    val probe = ProductQuantizer.ivfAdcTopK(store, cents, emb, "vec_id",
      "embedding", model, qv, nprobe = 2, candidates = 50, k = 5)
    probe.collect()
    // the probed-cell isin literal must reach the store scan as a
    // PartitionFilter — the non-probed inverted lists are never read
    val scans = probe.queryExecution.executedPlan.toString
    assert(scans.contains("PartitionFilters: [__cell"),
      s"probe must prune partitions at the scan:\n$scans")
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
