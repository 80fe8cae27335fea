package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** The fused digest-level MinHash join must be ROW-IDENTICAL to the
  * naive doc-level reference implementation (band self-join + distinct +
  * per-pair array_intersect/array_union verification) across band/
  * threshold configurations — same pairs, same jaccard values.
  */
class DedupEquivalenceSpec extends SparkTestBase {

  /** The r01 doc-level shape, kept as the semantic reference. */
  private def naiveNearDups(df: DataFrame, idCol: String, textCol: String,
                            threshold: Double, numHashes: Int,
                            bands: Int): DataFrame = {
    val cand = Dedup.minhashCandidates(df, idCol, textCol, numHashes, bands)
    val sets = df.select(col(idCol), Dedup.wordSet(col(textCol)).as("__set"))
    cand
      .join(sets.toDF(s"${idCol}_a", "__set_a"), Seq(s"${idCol}_a"))
      .join(sets.toDF(s"${idCol}_b", "__set_b"), Seq(s"${idCol}_b"))
      .withColumn("jaccard", Dedup.jaccard(col("__set_a"), col("__set_b")))
      .filter(col("jaccard") >= threshold)
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"),
        round(col("jaccard"), 3).as("jaccard"))
  }

  /** Doc-level banding + window-min, as shipped in r01. */
  private def naiveRepresentatives(df: DataFrame, idCol: String, textCol: String,
                                   numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandRows = df
      .withColumn("__sh", Dedup.wordSet(col(textCol)))
      .withColumn("__sig", Dedup.minhashSignature(col("__sh"), numHashes))
      .withColumn("__bands", Dedup.bandHashes(col("__sig"), bands, rows))
      .select(col(idCol), posexplode(col("__bands")).as(Seq("band", "bucket")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
    bandRows.withColumn("__bucket_min", min(idCol).over(w))
      .groupBy(idCol)
      .agg(min("__bucket_min").as("rep_id"))
      .withColumn("is_kept", col(idCol) === col("rep_id"))
  }

  test("digest-collapsed representatives are row-identical to the naive form") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Seq(8, 16).foreach { bands =>
      val fused = Dedup.minhashRepresentatives(docs, "doc_id", "text", 64, bands)
      val naive = naiveRepresentatives(docs, "doc_id", "text", 64, bands)
      assert(fused.exceptAll(naive).count() === 0L, s"bands=$bands fused-only")
      assert(naive.exceptAll(fused).count() === 0L, s"bands=$bands naive-only")
    }
  }

  test("representatives keep null-text documents (sentinel digest)") {
    import spark.implicits._
    // regression: equi-joins on a NULL digest silently dropped null-text
    // docs from the keep/drop decision; doc-level banding grouped them
    val docs = Seq((1L, Some("a b c")), (5L, None), (9L, None))
      .toDF("doc_id", "text")
    val fused = Dedup.minhashRepresentatives(docs, "doc_id", "text", 64, 8)
    val naive = naiveRepresentatives(docs, "doc_id", "text", 64, 8)
    assert(fused.count() === 3L, "every document must get a keep/drop row")
    assert(fused.exceptAll(naive).count() === 0L)
    assert(naive.exceptAll(fused).count() === 0L)
  }

  test("fused minhashNearDups is row-identical to the naive form") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Seq((0.9, 8), (0.8, 16), (0.5, 4)).foreach { case (t, bands) =>
      val fused = Dedup.minhashNearDups(docs, "doc_id", "text", t, 64, bands)
      val naive = naiveNearDups(docs, "doc_id", "text", t, 64, bands)
      val onlyFused = fused.exceptAll(naive).count()
      val onlyNaive = naive.exceptAll(fused).count()
      assert(onlyFused === 0L && onlyNaive === 0L,
        s"t=$t bands=$bands: fused-only=$onlyFused naive-only=$onlyNaive")
    }
  }

  test("fused == naive on randomized mini-corpora (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("lorem", "ipsum", "dolor", "sit", "amet", "alpha",
      "beta", "gamma", "delta", "epsilon")
    (0 until 3).foreach { trial =>
      // duplicate-heavy: a few templates, each copied with small mutations
      val templates = Vector.fill(5)(
        Vector.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))))
      val docs = (0 until 120).map { i =>
        val t = templates(rnd.nextInt(templates.size))
        val mutated =
          if (rnd.nextBoolean()) t
          else t.updated(rnd.nextInt(t.size), vocab(rnd.nextInt(vocab.size)))
        (i.toLong, mutated.mkString(" "))
      }.toDF("doc_id", "text")
      val t = Seq(0.5, 0.7, 0.9)(trial)
      val fused = Dedup.minhashNearDups(docs, "doc_id", "text", t, 32, 8)
      val naive = naiveNearDups(docs, "doc_id", "text", t, 32, 8)
      assert(fused.exceptAll(naive).count() === 0L, s"trial $trial fused-only")
      assert(naive.exceptAll(fused).count() === 0L, s"trial $trial naive-only")
    }
  }

  test("prefix-filtered containment == windowed on the window domain") {
    val docs = queries.tbl(spark, sf, "documents")
    Seq(0.7, 0.9).foreach { t =>
      val scale = Dedup.containmentNearDups(docs, "doc_id", "text", t)
        .filter(col("id_b") <= col("id_a") + 25)
      val windowed = Dedup.containmentPairsWindowed(docs, "doc_id", "text",
        window = 25, threshold = t)
      assert(scale.exceptAll(windowed).count() === 0L, s"t=$t scale-only")
      assert(windowed.exceptAll(scale).count() === 0L, s"t=$t windowed-only")
    }
  }

  test("prefix-filtered containment == brute force on randomized mini-corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
      "ii", "jj", "kk", "ll")
    Seq(0.6, 0.9).foreach { t =>
      val docs = (0 until 80).map { i =>
        val base = Vector.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        // every 5th doc quotes a prefix of the previous doc's words
        val words = if (i % 5 == 0 && i > 0) base.take(2) else base
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val sets = docs.select(col("doc_id"), Dedup.wordSet(col("text")).as("s"))
      val inter = size(array_intersect(col("__sa"), col("__sb"))).cast("double")
      val brute = sets.toDF("id_a", "__sa")
        .crossJoin(sets.toDF("id_b", "__sb"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("c_ab", round(inter / size(col("__sa")), 3))
        .withColumn("c_ba", round(inter / size(col("__sb")), 3))
        .filter(greatest(col("c_ab"), col("c_ba")) >= t)
        .select("id_a", "id_b", "c_ab", "c_ba")
      val fast = Dedup.containmentNearDups(docs, "doc_id", "text", t)
      assert(fast.exceptAll(brute).count() === 0L, s"t=$t fast-only")
      assert(brute.exceptAll(fast).count() === 0L, s"t=$t brute-only")
    }
  }

  test("containment keep decision == brute force on randomized mini-corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
      "ii", "jj", "kk", "ll")
    Seq(0.6, 0.9).foreach { t =>
      val docs = (0 until 80).map { i =>
        val base = Vector.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        val words = if (i % 5 == 0 && i > 0) base.take(2) else base
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      // brute per-doc smallest container (ANY other doc, identical sets
      // included, containing >= t of the doc's words)
      val sets = docs.select(col("doc_id"), Dedup.wordSet(col("text")).as("s"))
      val inter = size(array_intersect(col("__sa"), col("__sb"))).cast("double")
      val pmin = sets.toDF("id", "__sa")
        .crossJoin(sets.toDF("other", "__sb"))
        .filter(col("id") =!= col("other") &&
          round(inter / size(col("__sa")), 3) >= t)
        .groupBy("id").agg(min("other").as("__pmin"))
      val brute = sets.select(col("doc_id")).join(pmin,
          col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          least(col("doc_id"), coalesce(col("__pmin"), col("doc_id")))
            .as("rep_id"))
        .withColumn("is_kept", col("doc_id") === col("rep_id"))
      val fast = Dedup.containmentRepresentatives(docs, "doc_id", "text", t)
      assert(fast.exceptAll(brute).count() === 0L, s"t=$t fast-only")
      assert(brute.exceptAll(fast).count() === 0L, s"t=$t brute-only")
    }
  }

  test("containment keep: quoted docs drop, null-text group keeps min id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma"), // contained in 1 -> dropped
      (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String]), // exact dup of 3 -> dropped
      (5L, "unrelated content entirely")).toDF("doc_id", "text")
    val got = Dedup.containmentRepresentatives(docs, "doc_id", "text", 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got === Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (3L, true),
      4L -> (3L, false), 5L -> (5L, true)))
  }

  test("containment catches a short doc quoted inside a long one") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma plus lots of extra words around the quote " +
        "that drive jaccard far below any useful threshold"),
      (3L, "unrelated content entirely")).toDF("doc_id", "text")
    val got = Dedup.containmentNearDups(docs, "doc_id", "text", 0.9)
      .collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) === 1L && got(0).getLong(1) === 2L)
    assert(got(0).getDouble(2) === 1.0, "full containment of the short doc")
    // ... a pair symmetric Jaccard banding at t=0.9 could never emit
    val jac = Dedup.jaccard(col("__set_a"), col("__set_b"))
    val sets = docs.select(col("doc_id"), Dedup.wordSet(col("text")).as("s"))
    val j12 = sets.toDF("a", "__set_a").crossJoin(sets.toDF("b", "__set_b"))
      .filter(col("a") === 1 && col("b") === 2)
      .select(jac).head().getDouble(0)
    assert(j12 < 0.25, s"jaccard of the quoted pair is low: $j12")
  }
}
