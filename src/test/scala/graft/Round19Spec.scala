package graft

import org.apache.spark.sql.functions._

/** Round-19 pins: the ScanWidth probe's two directions measured against
  * ACTUAL scheduler partition counts (the r18 verdict's decisive-spec
  * ask for the adaptive spreadIds), the non-file-leaf fallback (ADVICE:
  * plans without file stats must never silently probe "wide"), and the
  * null-id canonical semantics of the ExactSubstr chain (ADVICE: the
  * packed-decimal and struct-min paths must agree).
  */
class Round19Spec extends SparkTestBase {
  import graft.operators.ScanWidth

  private def withMaxPartitionBytes[A](v: String)(body: => A): A = {
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try { spark.conf.set("spark.sql.files.maxPartitionBytes", v); body }
    finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  test("ScanWidth: the file-bytes bound equals the actual FilePartition " +
    "count of a projected single-column parquet scan, narrow and wide") {
    // `.rdd` caches on the Dataset, so each probe rebuilds the frame
    def slim = queries.tbl(spark, sf, "documents")
      .select(col("doc_id").cast("long"))
    // default maxPartitionBytes: a few-hundred-kB file is one split
    assert(ScanWidth.estimatedSplits(slim) ===
      slim.rdd.getNumPartitions.toLong)
    // 1 kB splits: one file, maxSplitBytes == maxPartitionBytes, so
    // packing closes a partition per split — the bound is EXACT here,
    // which pins that the estimate tracks the UNPROJECTED file bytes
    // the scheduler actually packs (a projected-stream estimate would
    // undershoot the real count several-fold)
    withMaxPartitionBytes("1024") {
      val actual = slim.rdd.getNumPartitions.toLong
      assert(actual > spark.sparkContext.defaultParallelism)
      assert(ScanWidth.estimatedSplits(slim) === actual)
      assert(ScanWidth.arrivesWide(slim))
    }
  }

  test("spreadIds: the decode stage runs at cluster width on a narrow " +
    "scan and stays un-spread on a wide one") {
    val docs = queries.tbl(spark, sf, "documents")
    // narrow arrival (one split): the pre-decode spread must land the
    // CPU-bound fingerprint stage on EVERY core
    val fp = graft.multimodal.Multimodal
      .audioFingerprints(docs, "doc_id", clusterSize = 5)
    assert(fp.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism,
      "a narrow scan must be spread to defaultParallelism before decode")
    // wide arrival (1 kB splits): the spread must NOT run — the decode
    // stage inherits the scan's own width
    withMaxPartitionBytes("1024") {
      val slimWidth = docs.select(col("doc_id").cast("long"))
        .rdd.getNumPartitions
      val fpWide = graft.multimodal.Multimodal
        .audioFingerprints(docs, "doc_id", clusterSize = 5)
      assert(fpWide.rdd.getNumPartitions === slimWidth,
        "a wide scan must reach the decode stage un-spread")
      assert(slimWidth > spark.sparkContext.defaultParallelism)
    }
  }

  test("ScanWidth: non-file leaves fall back to the exact probe instead " +
    "of trusting plan stats") {
    // a checkpointed frame's LogicalRDD leaf has no file index; a
    // stats-only probe reads defaultSizeInBytes (Long.MaxValue) there
    // and would claim "wide", silently skipping the spread — the exact
    // fallback must report the true partition count instead
    val ckpt = spark.range(100).toDF("id").repartition(2).localCheckpoint()
    assert(ScanWidth.fileSplitsLowerBound(ckpt).isEmpty,
      "a non-file leaf must not produce a byte bound")
    assert(ScanWidth.estimatedSplits(ckpt) === 2L)
    assert(!ScanWidth.arrivesWide(ckpt))
  }

  test("ExactSubstr: null-id docs neither count nor mark, identically " +
    "on the packed-decimal and struct-min canonical paths") {
    // one duplicated 60-char block with NO internal repetition (a
    // constant run would be cut inside the canonical doc too — the
    // self-repeat semantics ExactSubstrSpec pins), minLen = 50
    val dup = (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '7')).mkString
    val mk = (prefix: String) => Seq(
      (Option(1L), "a", s"left-$prefix-one $dup"),
      (Option(2L), "b", s"left-$prefix-two $dup tail-two"),
      (Option.empty[Long], null.asInstanceOf[String], s"null-owner $dup"))
    // "idNum" takes the packed-decimal(38,0) argmin path, "idStr" the
    // struct-min fallback — the pinned semantics must hold on BOTH
    for (id <- Seq("idNum", "idStr")) {
      val df = spark.createDataFrame(mk(id))
        .toDF("idNum", "idStr", "text")
      for (minimized <- Seq(false, true)) {
        val out = (if (minimized)
          graft.textanalysis.TextAnalysis
            .exactSubstrDedupMinimized(df, id, "text")
        else
          graft.textanalysis.TextAnalysis
            .exactSubstrDedup(df, id, "text"))
          .collect().map(r => Option(r.get(0)) ->
            (r.getLong(2), r.getString(3))).toMap
        val chainName = s"chain(minimized=$minimized, id=$id)"
        // the null-id doc passes through UNCUT and books no removal
        assert(out(None)._1 === 0L, chainName)
        assert(out(None)._2.contains(dup), chainName)
        // the canonical among NON-NULL ids keeps its copy; the later
        // doc is cut. Under the old struct-min behavior the null-id
        // doc would rank first and doc "a"/1 would lose its copy too.
        val first = out.keys.flatten.map(_.toString).min // "1" / "a"
        val keepKey = out.keys.find(_.exists(_.toString == first)).get
        val cutKey = out.keys.find(k =>
          k.isDefined && k != keepKey).get
        assert(out(keepKey)._1 === 0L, chainName)
        assert(out(keepKey)._2.contains(dup), chainName)
        assert(out(cutKey)._1 >= 60L, chainName)
        assert(!out(cutKey)._2.contains(dup), chainName)
      }
    }
  }
}
