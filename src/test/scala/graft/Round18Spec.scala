package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.operators.Dsir
import graft.textanalysis.TextAnalysis

/** Pins for the round-18 gates: JPEG corruption tolerance and the
  * composed curation capstone (exact-substr → near-dup → selection). */
class Round18Spec extends SparkTestBase {
  import spark.implicits._

  test("decodeGrayOpt: the three gate corruption classes fail to None, " +
    "intact decodes, and a mid-stream truncation NEVER throws") {
    val jpg = Multimodal.encodeGrayJpeg(27, 24, 0.9f,
      (x, y) => ((x / 3 + y / 3) % 2) * 160 + 48)
    assert(Multimodal.decodeGrayOpt(jpg).isDefined)
    assert(Multimodal.decodeGrayOpt(jpg.drop(1)).isEmpty, "no-magic")
    assert(Multimodal.decodeGrayOpt(
      Array.tabulate[Byte](64)(i => (i * 37 + 11).toByte)).isEmpty,
      "garbage")
    assert(Multimodal.decodeGrayOpt(jpg.take(4)).isEmpty, "header-only")
    assert(Multimodal.decodeGrayOpt(null).isEmpty)
    assert(Multimodal.decodeGrayOpt(Array.emptyByteArray).isEmpty)
    // partial decode: header dims survive, no exception escapes — the
    // tolerance contract is "book what the codec salvages"
    val partial = Multimodal.decodeGrayOpt(jpg.take(jpg.length * 6 / 10))
    partial.foreach { case (w, h, pix) =>
      assert(w === 27 && h === 24 && pix.length === w * h)
    }
  }

  test("jpegDHashesTolerant: intact ids (id%4==0) replay the fixture " +
    "dHash, corrupted ids book ok=false with null features") {
    val ids = spark.range(40).select(col("id").as("doc_id"))
    val out = Multimodal.jpegDHashesTolerant(ids, "doc_id", 0.9f)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.size === 40)
    for (id <- 0L until 40L) {
      val r = out(id)
      if (id % 4 == 0) {
        val cs = Multimodal.testJpegCell(id)
        assert(r.ok && r.width === Some(9 * cs) &&
          r.height === Some(8 * cs) &&
          r.dhash === Some(Multimodal.testJpegDHash(id)), s"id=$id")
      } else {
        assert(!r.ok && r.width.isEmpty && r.height.isEmpty &&
          r.dhash.isEmpty, s"id=$id")
      }
    }
  }

  test("pipeline_curation7 equals its stage-by-stage recomposition on " +
    "a crafted corpus (exact-substr cut -> minhash keep -> DSIR top-k)") {
    val boiler = "SHARED-BOILERPLATE-BLOCK-" * 3 // 75 chars, > minLen=50
    val docs = (
      (1L to 12L).map(i => (i,
        s"unique words u${i}a u${i}b u${i}c $boiler tail t$i", "en")) ++
      (13L to 20L).map(i => (i,
        s"palabras unicas p${i}a p${i}b fin f$i", "es")) ++
      // exact near-dup family: identical word sets after the cut
      Seq((21L, "same same tokens here exactly", "en"),
        (22L, "same same tokens here exactly", "en"))
      ).toDF("doc_id", "text", "lang")

    // the composed query, exactly as the gate builds it
    val composed = {
      val clean = TextAnalysis.exactSubstrDedupMinimized(docs, "doc_id",
          "text", minLen = 50, k = 8)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("clean_text"))
        .localCheckpoint()
      val kept = Dedup.minhashRepresentativesMd5(clean, "doc_id",
          "clean_text")
        .where(col("is_kept")).select("doc_id")
      Dsir.gumbelTopK(
          Dsir.importanceWeights(clean.join(kept, Seq("doc_id"),
            "left_semi"), "doc_id", "clean_text",
            isTarget = col("lang") === "en", buckets = 2048), k = 10)
        .orderBy(col("key_ppm").desc, col("id"))
        .collect().map(_.toString).toSeq
    }

    // stage-by-stage, materializing each intermediate to be sure the
    // composition introduces nothing
    val stage1 = TextAnalysis.exactSubstrDedup(docs, "doc_id", "text", 50)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("clean_text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // the boilerplate block must actually have been cut somewhere
    assert(stage1.count(_._3.contains("SHARED-BOILERPLATE")) === 1,
      "exactly the canonical occurrence keeps the block")
    val s1df = stage1.toSeq.toDF("doc_id", "lang", "clean_text")
    val keep2 = Dedup.minhashRepresentativesMd5(s1df, "doc_id",
        "clean_text")
      .where(col("is_kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // the identical pair dedups to one representative
    assert(keep2.contains(21L) && !keep2.contains(22L))
    val s2df = s1df.where(col("doc_id").isin(keep2.toSeq: _*))
    val expected = Dsir.gumbelTopK(
        Dsir.importanceWeights(s2df, "doc_id", "clean_text",
          isTarget = col("lang") === "en", buckets = 2048), k = 10)
      .orderBy(col("key_ppm").desc, col("id"))
      .collect().map(_.toString).toSeq

    assert(composed === expected)
  }

  test("ScanWidth: a compact scan probes narrow (spread runs), a wide " +
    "one probes wide (spread skipped) — without building an execution " +
    "RDD") {
    import graft.operators.ScanWidth
    // compact: the sf0.001 documents parquet is a few hundred kB —
    // one split on any sane maxPartitionBytes
    val docs = queries.tbl(spark, sf, "documents")
    assert(ScanWidth.estimatedSplits(docs.select("doc_id")) <
      spark.sparkContext.defaultParallelism,
      "a compact scan must probe narrower than the cluster")
    assert(!ScanWidth.arrivesWide(docs.select("doc_id")))
    // wide: shrink maxPartitionBytes so the same file exceeds the
    // cluster width — the probe must flip without any code change
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      assert(ScanWidth.arrivesWide(docs.select("doc_id")),
        "at 1 kB splits the same scan must probe wide")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }
}
