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

  test("exactSubstrDedupAuto: the chain is chosen by corpus size — " +
    "full below the crossover, minimized above, minimized when no " +
    "file statistic exists") {
    import graft.textanalysis.TextAnalysis
    val docs = queries.tbl(spark, sf, "documents")
    // the decision itself is pinned through the package-visible
    // predicate (the round-19 eager pins execute the winnow stage at
    // construction, so the chosen chain is no longer visible in the
    // final plan string)
    // a few-hundred-kB corpus sits far below the ~100k-doc crossover
    assert(!TextAnalysis.minimizedChainChosen(docs,
      TextAnalysis.MinimizedChainAboveBytes))
    // force the threshold under the file size: minimized chain
    assert(TextAnalysis.minimizedChainChosen(docs, 1L))
    // no file leaves -> no trustworthy size -> the scale-safe default
    import spark.implicits._
    val mem = Seq((1L, "x" * 80), (2L, "y" * 80)).toDF("doc_id", "text")
      .localCheckpoint()
    assert(TextAnalysis.minimizedChainChosen(mem,
      TextAnalysis.MinimizedChainAboveBytes))
    // and the two chains the chooser picks between agree on real data
    val full = TextAnalysis.exactSubstrDedup(docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val auto = TextAnalysis.exactSubstrDedupAuto(docs, "doc_id", "text",
        minimizedAboveBytes = 1L)
      .collect().map(_.toString).sorted.toSeq
    assert(auto === full)
  }

  test("DashboardDemo: chart surfaces match the A9/A12 gates, every " +
    ":sql twin is row-identical to its method form, pagination " +
    "partitions the sorted view") {
    val vs = new graft.query.ViewServer(
      DashboardDemo.unitsFixture(spark, sf), "units_r19demo")
    try {
      val surfaces = DashboardDemo.drive(vs, "units_r19demo",
        proyecto = "Brand#7", estado = "ECONOMY",
        searchTerm = "anodized", pageSize = 5).toMap
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toString).toSeq
      // the demo's A9/A12 charts are the gates' queries, value-for-value
      assert(rows(surfaces("chart_estados")) ===
        rows(SparkEntry.queries("view_count_by_estado")(spark, sf)))
      assert(rows(surfaces("chart_scatter")) ===
        rows(SparkEntry.queries("view_scatter")(spark, sf)))
      // the SQL surface IS the method surface
      for (c <- Seq("chart_estados", "chart_avg_precio", "chart_scatter"))
        assert(rows(surfaces(c)).sorted === rows(surfaces(c + ":sql")).sorted,
          s"$c: method and SQL twins diverged")
      // pagination: page sizes follow the filtered total, pages disjoint
      val total = rows(surfaces("filter_proyecto")).size
      val p1 = rows(surfaces("page1")); val p2 = rows(surfaces("page2"))
      assert(p1.size === math.min(5, total))
      assert(p2.size === math.min(5, math.max(0, total - 5)))
      assert(p1.toSet.intersect(p2.toSet).isEmpty)
      // the stacked chart pair shares its label rows
      val stacks = DashboardDemo.stackedCharts(vs).toMap
      assert(rows(stacks("chart_stack").select("Proyecto")) ===
        rows(stacks("chart_stack_pct").select("Proyecto")))
    } finally vs.close()
  }

  test("session-default Checkpoints.pin: the capstone compositions land " +
    "identical output with and without a session checkpoint dir, and " +
    "the reliable run writes checkpoint data") {
    val sc = spark.sparkContext
    def run(gate: String): Seq[String] =
      SparkEntry.queries(gate)(spark, sf)
        .collect().map(_.toString).toSeq
    for (gate <- Seq("pipeline_curation7", "graph_triangles")) {
      sc.setCheckpointDir(null)
      val local = run(gate)
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt19")
      try {
        sc.setCheckpointDir(dir.toString)
        val reliable = run(gate)
        assert(reliable === local, gate)
        val wrote = java.nio.file.Files.walk(dir).count() > 1
        assert(wrote, s"$gate: no checkpoint data under $dir")
      } finally sc.setCheckpointDir(null)
    }
  }
}
