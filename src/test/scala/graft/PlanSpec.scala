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

  test("grouped laned prefix: row-capped hint keeps the offsets join " +
    "broadcast at gate-scale group counts (round-14 fix — dropping the " +
    "hint outright planned a sort-merge join that re-shuffled the " +
    "data-sized laned frame)") {
    val p = plan("agg_gini_grouped")
    assert(p.contains("BroadcastHashJoin"),
      "the (group, lane) offsets/totals joins must broadcast while the " +
        "materialized sums frame is under LanedPrefix.BroadcastRowCap")
    assert(!p.linesIterator.exists(l => l.contains("SortMergeJoin")),
      s"no SMJ expected in the grouped-gini plan at gate scale")
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

  test("cosine near-dup: banded equi-join with fused verify, no cartesian") {
    val p = plan("dedup_cosine_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"sign-LSH blocking must stay a (band, bucket) equi-join:\n$p")
    assert(p.contains("first_equal_index"),
      s"pair dedup must be the in-join first-collision filter:\n$p")
    // verification is in the JOIN CONDITION: the cosine threshold must
    // not survive as a post-join Filter node
    val joinCond = p.linesIterator.find(_.contains("first_equal_index"))
    assert(joinCond.exists(_.contains("0.3")),
      s"cosine threshold must be fused into the join condition:\n$p")
  }

  test("connected components: truncated lineage, hash joins every round") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    // capture EVERY plan the fixpoint executes — each round's neighbor-min
    // and label-of-label joins must stay hash equi-joins (a cartesian in
    // round 3 of a 100 TB run is invisible to a final-plan-only check)
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      import spark.implicits._
      val pairs = (0L until 59L).map(i => (i, i + 1)).toDF("a", "b")
      graft.dedup.Dedup.connectedComponents(
        pairs, "a", "b", (0L until 60L).toDF("id"), "id").collect()
      // listener delivery is async; poll until the bus drains
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (plans.synchronized(plans.isEmpty) && System.nanoTime() < deadline)
        Thread.sleep(50)
      Thread.sleep(200) // let the remaining round plans land
      val all = plans.synchronized(plans.mkString("\n===\n"))
      assert(plans.nonEmpty, "listener captured no fixpoint plans")
      assert(!all.contains("CartesianProduct")
          && !all.contains("BroadcastNestedLoopJoin"),
        s"a fixpoint round degraded to a non-equi join:\n$all")
    } finally spark.listenerManager.unregister(listener)
    // the gate query's final frame reads from the checkpointed RDD — the
    // per-round lineage is truncated, not re-planned from round 0
    val p = plan("dedup_components")
    assert(p.contains("ExistingRDD"),
      s"components output must scan the checkpoint, not replay lineage:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("top-ngrams: map-side partial agg + TakeOrderedAndProject (no global sort)") {
    val p = plan("text_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must merge per-partition heads, not globally sort:\n$p")
    assert(p.contains("partial_count"),
      s"gram counting must partial-aggregate map-side:\n$p")
  }

  test("stratified sample: one strata shuffle feeding the window cut") {
    val p = plan("sample_stratified")
    assert(p.contains("Window"), s"per-stratum cut must be a window:\n$p")
    val hashExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges === 1,
      s"exactly one hash shuffle (the strata key), got $hashExchanges:\n$p")
  }

  test("MinHash signature is the single-pass native expression") {
    // the GATE runs the md5 replayable family (r8); the xx64 PRODUCTION
    // operator must still plan through the fused codegen expression.
    // Since round 19 the near-dup operator pins its signature stage
    // eagerly (the stage executes at construction and the downstream
    // plan bottoms at the pinned scan), so the assertion probes the
    // signature projection itself — the exact stage the operator runs.
    import org.apache.spark.sql.functions._
    val p = graft.queries.tbl(spark, sf, "documents")
      .select(graft.dedup.Dedup.minhashSignature(
        graft.dedup.Dedup.wordSet(col("text")), 64).as("__sig"))
      .queryExecution.executedPlan.toString
    assert(p.contains("minhash_signature"),
      "signature must be the fused MinHashSignature expression, " +
        "not 64 interpreted transform passes")
  }

  test("chunking is a pure narrow plan (no shuffle before the sort)") {
    val p = plan("text_chunks")
    // everything below the gate's presentation orderBy must be
    // scan -> generate -> project: no hash exchange, no join, no agg
    val body = p.substring(p.indexOf("Exchange rangepartitioning") + 1)
    assert(!body.contains("Exchange hashpartitioning") && !body.contains("Join"),
      s"chunk expansion must not shuffle the corpus:\n$p")
  }

  test("tf-idf: vocabulary and corpus count broadcast back onto tf") {
    val p = plan("text_tfidf")
    val broadcasts = "BroadcastExchange".r.findAllIn(p).length
    assert(broadcasts >= 2,
      s"df table and corpus count must both broadcast (got $broadcasts):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus-scale tf table must never re-shuffle for the idf join:\n$p")
  }

  test("sequence packing: one corpus shuffle, offsets window is bucket-sized") {
    val p = plan("text_pack")
    // the corpus-side window partitions by the id bucket (one hash
    // exchange); the only unpartitioned window runs on the per-bucket
    // totals inside the broadcast build, after a partial-aggregating
    // groupBy — never on the corpus
    val buildSide = p.substring(p.indexOf("BroadcastExchange"))
    assert(buildSide.contains("Exchange SinglePartition")
        && buildSide.contains("partial_sum"),
      s"global offset window must run on aggregated bucket totals:\n$p")
    val streamSide = p.substring(0, p.indexOf("BroadcastExchange"))
    assert(!streamSide.contains("Exchange SinglePartition"),
      s"the corpus must never collapse to a single partition:\n$p")
  }

  test("bucketed join: scan→SMJ→agg with ZERO Exchange") {
    val work = java.nio.file.Files.createTempDirectory("graft-bjplan").toString
    val df = graft.operators.BucketedJoin
      .customerOrderTotals(spark, sf, work, buckets = 4)
    df.collect() // finalize the AQE plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"),
      s"bucketed big⨯big join must sort-merge:\n$p")
    assert(!p.contains("Exchange"),
      s"bucketed scan satisfies both the join and the agg distribution — " +
        s"any Exchange means the write-time shuffle was wasted:\n$p")
    assert(p.contains("Bucketed: true"),
      s"both scans must read bucketed:\n$p")
  }

  test("bm25: one scan, no explode, stats broadcast back") {
    val df = graft.textanalysis.TextAnalysis.bm25(
      spark.read.parquet(s"$sf/documents.parquet"),
      "doc_id", "text", Seq("hash", "join", "vector"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Generate"),
      s"per-term tf must be expressions over the token array, not explode:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row stats frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must never shuffle for the stats join:\n$p")
  }

  test("semantic dedup: within-cell equi-join, assignment is a pure map") {
    val df = graft.similarity.Similarity.semanticDedupKeep(
      spark.read.parquet(s"$sf/embeddings.parquet"), "vec_id", "embedding",
      dim = 64, nlist = 4, threshold = 0.3)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cell blocking must make the candidate join an equi-join:\n$p")
  }

  test("containment prefix join: equi-joins only, doc-bounded window") {
    val df = graft.dedup.Dedup.containmentNearDups(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", 0.9)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"the token join must stay an equi-join:\n$p")
    // the only window ranks tokens WITHIN one digest's set — always
    // partitioned, never corpus-wide
    assert(!p.contains("Window [") ||
      "Window \\[".r.findAllIn(p).isEmpty || p.contains("windowspecdefinition(__dig"),
      s"the rank window must partition by digest:\n$p")
  }

  test("containment keep decision: equi-joins only, digest-bounded window") {
    val df = graft.dedup.Dedup.containmentRepresentatives(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", 0.9)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"the decision path must stay on equi-joins:\n$p")
    assert(!p.contains("windowspecdefinition()") &&
      (!p.contains("Window [") || p.contains("windowspecdefinition(__dig")),
      s"the only window is the per-digest token rank:\n$p")
  }

  test("maintainFull: detail recompute is semi-join-pruned, no window") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Seq((1L, 10.0), (2L, 5.0)).toDF("k", "v")
    val base = rows.groupBy("k").agg(count(lit(1)).as("cnt"),
      sum("v").as("v_sum"), min("v").as("v_min"), max("v").as("v_max"))
    val changes = Seq((1L, Some(10.0), Option.empty[Double]))
      .toDF("k", "old_v", "new_v")
    val df = graft.operators.IncrementalAgg.maintainFull(
      base, changes, rows, "k", "v", "old_v", "new_v")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"),
      s"invalidated-key recompute must prune detail via a semi join:\n$p")
    assert(!p.contains("Window"),
      s"IVM must be aggregation + joins, never a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"all joins key on the aggregate key:\n$p")
  }

  test("funnel replay: per-step key joins, no window, no event collection") {
    import org.apache.spark.sql.functions.expr
    val ev = queries.tbl(spark, sf, "events")
      .withColumn("ts_us", expr("CAST(ts AS LONG) div 1000"))
    val df = graft.streaming.StreamingFunnel.progressReplay(
      ev, "user_id", "event_type", "ts_us", Seq("view", "click", "purchase"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"greedy advance must be min-aggregates, never a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"step joins must stay equi-joins on the user key:\n$p")
    assert(!p.contains("collect_list"),
      s"no per-user event collection:\n$p")
  }

  test("equi-depth assignment: literal cuts, pure map over one pruned scan") {
    val p = plan("layout_equidepth")
    assert(!p.contains("Window"),
      s"bucket assignment must be a pure map, never a rank window:\n$p")
    // the sketch resolves to literals at build time: the assignment
    // plan is scan -> filter -> project(CASE...) -> partial agg
    assert(p.contains("CASE WHEN") && p.contains("PushedFilters:"),
      s"cuts must inline as literals over a pushed-down scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"no join belongs in the assignment path:\n$p")
  }

  test("quantile sketch family: bounded top-k, never a global sort") {
    Seq("agg_qsketch", "agg_qsketch_merge").foreach { q =>
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject") ||
        p.contains("TopKPerGroup"),
        s"$q must draw its sample with a bounded top-k operator:\n$p")
    }
    val pg = plan("agg_qsketch_grouped")
    assert(pg.contains("TopKPerGroup"), // Exec suffix stripped in plans
      s"grouped sample must run the bounded-buffer operator:\n$pg")
  }

  test("dsir: model table broadcasts into the scoring join, resample " +
    "plans as bounded top-k, no window anywhere") {
    val pw = plan("curate_dsir_weights")
    assert(pw.contains("BroadcastHashJoin"),
      s"the <=buckets-row log-ratio table must broadcast:\n$pw")
    assert(!pw.contains("Window") && !pw.contains("SortMergeJoin"),
      s"DSIR scoring is aggregation + a broadcast join only:\n$pw")
    val ps = plan("sample_importance")
    assert(ps.contains("TakeOrderedAndProject"),
      s"Gumbel top-k must plan as TakeOrderedAndProject:\n$ps")
  }

  test("curriculum: every window is partitioned or bounded — the " +
    "band/within ranks ride the laned prefix, not a one-task sort") {
    val p = plan("curate_curriculum")
    // in plan text an UNPARTITIONED spec starts with a sort column:
    // windowspecdefinition(x ASC ...); a partitioned one leads with the
    // bare partition column before the sort
    val wins = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    val unpart = wins.count(l =>
      raw"windowspecdefinition\([^,]*\b(ASC|DESC)\b".r
        .findFirstIn(l).isDefined)
    assert(wins.nonEmpty, s"ranks must exist in the plan:\n$p")
    assert(unpart <= 2,
      s"only the <= nLanes offset windows may be unpartitioned:\n$p")
    assert(wins.size > unpart,
      s"the data-sized rank window must be lane-partitioned:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("duplicated spans: two partial-agg shuffles + a key join, no window") {
    val df = graft.textanalysis.TextAnalysis.duplicatedSpans(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", n = 8)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"span counting must be aggregation, never a corpus window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"the span-count join must be an equi-join:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"span counts must partial-aggregate map-side:\n$p")
  }

  test("exact-substr dedup: gram counting is aggregation + equi-joins, " +
    "interval merge is per-doc expressions — no window, no cartesian") {
    val p = plan("dedup_exact_substr")
    assert(!p.contains("Window"),
      s"the keep-first canonical is a struct-min AGGREGATE, and the " +
        s"interval merge a per-row higher-order expression — a window " +
        s"here would funnel the corpus:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"gram count-back and mark joins must be equi-joins:\n$p")
    assert(p.contains("HashAggregate"),
      s"gram counts must partial-aggregate map-side:\n$p")
  }

  test("winnowed exact-substr: same no-window/no-cartesian contract as " +
    "the full chain, with the minimizer selection inside codegen") {
    val p = plan("dedup_exact_substr_min")
    assert(!p.contains("Window"),
      s"minimizer counting and the reduced gram chain are aggregates " +
        s"and per-row expressions, never a corpus window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"minimizer count-back and mark joins must be equi-joins:\n$p")
    assert(p.contains("HashAggregate"),
      s"minimizer/gram counts must partial-aggregate map-side:\n$p")
    // the minimizer stage pins eagerly since round 19 (it has two
    // downstream readers), so the gate's final plan bottoms at the
    // pinned scan — the native-expression contract is asserted on the
    // selection projection itself
    import org.apache.spark.sql.functions._
    val sel = graft.queries.tbl(spark, sf, "documents")
      .select(explode(
        graft.functions.WinnowMinimizers(col("text"), 8, 43)).as("mm"))
      .queryExecution.executedPlan.toString
    assert(sel.contains("winnow_minimizers"),
      s"the selection must run through the native expression:\n$sel")
  }

  test("curation-7 capstone: three composed stages, equi/broadcast " +
    "joins only — no corpus window, no pair product") {
    val p = plan("pipeline_curation7")
    assert(!p.contains("CartesianProduct"),
      s"exact-substr, LSH keep and DSIR stages all join on keys:\n$p")
    // the one tolerated nested loop is DSIR's bounded totals cross:
    // the 1-row (tt, rt) aggregate broadcast against <= buckets rows —
    // every NestedLoopJoin must be that broadcast form, never shuffled
    assert(countOf(p, "NestedLoopJoin") ===
      countOf(p, "BroadcastNestedLoopJoin"),
      s"only the broadcast totals cross may nested-loop:\n$p")
    assert(!p.contains("Window"),
      s"no stage may funnel the corpus through a window:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the Gumbel top-k must plan as TakeOrderedAndProject, not a " +
        s"global sort:\n$p")
  }

  private def countOf(haystack: String, needle: String): Int =
    haystack.sliding(needle.length).count(_ == needle)

  test("jpeg tier: the decode stage runs after the id-spread exchange " +
    "(partition-parallel codec work, the mm_audio_real lesson)") {
    val p = plan("mm_jpeg_real")
    assert(p.contains("Exchange hashpartitioning"),
      s"ids must spread before the CPU-bound encode/decode:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("streaming ccnet twin: sketch sample via bounded top-k; the " +
    "only windows run on <= K sketch rows per language") {
    val p = plan("stream_ccnet_buckets")
    assert(p.contains("TopKPerGroup"),
      s"the per-language sample must use the bounded-buffer operator:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no unbounded pair product anywhere:\n$p")
    // the one nested-loop is the 2-row probs table probing the <= K
    // ranked sketch rows (rn = floor(p*(n-1))+1 is non-equi by nature);
    // it must build the PROBS side, never a data-sized one
    assert(!p.contains("BroadcastNestedLoopJoin") ||
      p.contains("LocalTableScan"),
      s"only the literal probs frame may nested-loop:\n$p")
    // every Window node partitions by the language key over the <= K
    // sketch rows — an UNPARTITIONED spec would funnel to one task
    val wins = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(wins.forall(_.contains("windowspecdefinition(key")),
      s"sketch read-off windows must partition by language:\n$p")
  }
}
