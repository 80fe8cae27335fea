package graft

import org.apache.spark.sql.functions._
import graft.operators.{BucketedJoin, Profile}
import graft.queries.Round7
import graft.similarity.Similarity
import graft.textanalysis.TextAnalysis

/** Behavioral specs for the round-7 operators (the DuckDB gates check
  * cross-engine values; these pin the semantic invariants). */
class Round7Spec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = queries.tbl(spark, sf, "embeddings")
  private lazy val docs = queries.tbl(spark, sf, "documents")

  // ---------------- bucketed join ----------------

  test("bucketed join equals the plain join, bucket files per bucket") {
    val work = java.nio.file.Files.createTempDirectory("graft-bj").toString
    val got = BucketedJoin.customerOrderTotals(spark, sf, work, buckets = 4)
      .orderBy("c_custkey").collect()
    val cust = queries.tbl(spark, sf, "customer")
    val ords = queries.tbl(spark, sf, "orders")
    val want = cust.join(ords, col("c_custkey") === col("o_custkey"))
      .groupBy("c_custkey", "c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("c_custkey").collect()
    assert(got.toSeq === want.toSeq)
  }

  // ---------------- semantic dedup ----------------

  test("semantic dedup: one row per vector, cell minima always keep") {
    val out = Similarity.semanticDedupKeep(emb, "vec_id", "embedding",
      dim = 64, nlist = 4, threshold = 0.3).cache()
    assert(out.count() === emb.count())
    // the smallest id in every cell has no lower-id peer -> must keep
    val cellMin = out.groupBy("cell").agg(min("vec_id").as("vec_id"))
    val minKeeps = out.join(cellMin, Seq("cell", "vec_id"))
      .filter(!col("keep")).count()
    assert(minKeeps === 0, "a cell's lowest id can never be a dropped dup")
    out.unpersist()
  }

  test("semantic dedup: dropped vectors really have a near-dup keeper") {
    // brute-force replay on the small test slice: keep=false implies a
    // lower-id vector in the SAME cell with round4 cosine >= t
    val t = 0.3
    val out = Similarity.semanticDedupKeep(emb, "vec_id", "embedding",
      dim = 64, nlist = 4, threshold = t)
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCell = out.select($"vec_id", $"cell", $"keep")
      .as[(Long, Long, Boolean)].collect().groupBy(_._2)
    byCell.values.foreach { members =>
      val ids = members.map(_._1).sorted
      members.filter(!_._3).foreach { case (id, _, _) =>
        assert(ids.exists(o => o < id && cos(vecs(o), vecs(id)) >= t),
          s"vec $id dropped without a lower-id near-dup in its cell")
      }
    }
  }

  // ---------------- BM25 ----------------

  test("bm25: zero for docs without query terms, positive with them") {
    val scored = TextAnalysis.bm25(docs, "doc_id", "text",
      Seq("hash", "join", "vector"))
    val withFlag = docs.select($"doc_id",
      ($"text".contains("hash") || $"text".contains("join") ||
        $"text".contains("vector")).as("hit"))
      .join(scored, "doc_id")
    assert(withFlag.filter(!$"hit" && $"bm25" > 0).count() === 0,
      "no query term -> zero score")
    assert(scored.filter($"bm25" > 0).count() > 0, "some doc must score")
  }

  test("bm25: more matched terms outrank fewer on equal-length docs") {
    val d = Seq((1L, "alpha beta gamma delta"), (2L, "hash beta gamma delta"),
      (3L, "hash join gamma delta")).toDF("doc_id", "text")
    val s = TextAnalysis.bm25(d, "doc_id", "text", Seq("hash", "join"))
      .as[(Long, Double)].collect().toMap
    assert(s(1L) === 0.0)
    assert(s(3L) > s(2L) && s(2L) > 0.0)
  }

  // ---------------- profiling ----------------

  test("profile counts rows, nulls, distincts per column") {
    val d = Seq((Some(1), Some("a")), (Some(1), None), (None, Some("b")))
      .toDF("x", "y")
    val p = Profile(d, Seq("x", "y")).orderBy("col_name").collect()
    assert(p.length === 2)
    val Array(x, y) = p
    assert(x.getString(0) === "x" && x.getLong(1) === 3 &&
      x.getLong(2) === 1 && x.getLong(3) === 1)
    assert(y.getString(0) === "y" && y.getLong(2) === 1 &&
      y.getLong(3) === 2 && y.getDouble(4) === 0.3333)
  }

  test("profile approx mode stays within HLL error on the gate table") {
    val exact = Profile(queries.tbl(spark, sf, "orders"), Round7.OrdersCols)
      .select($"col_name", $"n_distinct").as[(String, Long)].collect().toMap
    val approx = Profile(queries.tbl(spark, sf, "orders"), Round7.OrdersCols,
      exact = false)
      .select($"col_name", $"n_distinct").as[(String, Long)].collect().toMap
    exact.foreach { case (c, n) =>
      assert(math.abs(approx(c) - n) <= math.max(4L, (n * 0.1).toLong),
        s"approx distinct for $c too far: ${approx(c)} vs $n")
    }
  }

  // ---------------- corpus-wide keep-first unit dedup ----------------

  test("dedupUnitsGlobal keeps exactly the first occurrence of each unit") {
    val d = Seq(
      (1L, "alpha beta\ngamma delta"),
      (2L, "alpha beta\nunique line"),
      (3L, "gamma delta\nalpha beta")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupUnitsGlobal(d, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0) === ((1L, "alpha beta\ngamma delta", 0L, 2L)))
    assert(out(1) === ((2L, "unique line", 1L, 2L)))
    assert(out(2) === ((3L, "", 2L, 2L)))
  }

  test("dedupUnitsGlobal total kept units equals distinct units") {
    val out = TextAnalysis.dedupUnitsGlobal(docs, "doc_id", "text",
      splitUnits = t => TextAnalysis.tokenSpans(t, 2), sep = " ")
    val kept = out.agg(sum($"n_units" - $"n_dropped")).as[Long].head()
    val distinctUnits = docs
      .filter(length(trim($"text")) > 0)
      .select(explode(TextAnalysis.tokenSpans($"text", 2)).as("u"))
      .distinct().count()
    assert(kept === distinctUnits,
      "one survivor per distinct unit, no more, no fewer")
  }

  // ---------------- incremental batch-vs-index dedup ----------------

  test("incremental dedup flags index hits and batch-internal dups") {
    val index = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "beta alpha"),   // word-set dup of index doc 1 -> drop
      (11L, "epsilon zeta"), // unseen, first in batch -> keep
      (12L, "zeta epsilon"), // batch-internal dup of 11 -> drop
      (13L, "eta theta")     // unseen, unique -> keep
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.incrementalExact(batch, index, "doc_id", "text")
      .orderBy("doc_id")
      .select($"doc_id", $"dup_of_index", $"keep")
      .as[(Long, Option[Long], Boolean)].collect()
    assert(out.toSeq === Seq(
      (10L, Some(1L), false), (11L, None, true),
      (12L, None, false), (13L, None, true)))
  }

  // ---------------- forward-fill resample ----------------

  test("resampleHourlyFfill fills gap hours with the last average") {
    val h = 3600L * 1000000000L
    val base = 1704067200L * 1000000000L // 2024-01-01
    val ev = Seq(
      (1L, base, "click", 10.0),
      (2L, base + h / 2, "click", 20.0), // hour 0: avg 15.0
      (3L, base + 3 * h, "click", 40.0)  // hours 1,2 missing; hour 3: 40.0
    ).toDF("event_id", "ts", "event_type", "value")
    val out = graft.streaming.EventWindows.resampleHourlyFfill(ev)
      .orderBy("hour_start")
      .select($"hour_start", $"avg_filled", $"n_events")
      .as[(Long, Double, Long)].collect()
    val h0 = base / 1000000000L
    assert(out.toSeq === Seq(
      (h0, 15.0, 2L), (h0 + 3600, 15.0, 0L),
      (h0 + 7200, 15.0, 0L), (h0 + 10800, 40.0, 1L)))
  }

  // ---------------- int8 coarse + exact rescore ----------------

  test("int8 rescore top-k equals exact brute-force top-k") {
    val q = emb.filter($"vec_id" === 3).select($"embedding".as("qvec"))
    val exact = Similarity.topK(emb, "vec_id", "embedding", q, "qvec", 10)
      .collect().toSeq
    val twoStage = Similarity.int8RescoreTopK(emb, "vec_id", "embedding",
      q, "qvec", candidates = 50, k = 10).collect().toSeq
    assert(twoStage === exact)
  }

  // ---------------- grouping sets ----------------

  test("grouping sets emits every requested set exactly once") {
    val rows = SparkEntry.queries("agg_grouping_sets")(spark, sf).collect()
    val ords = queries.tbl(spark, sf, "orders")
    val nStatus = ords.select("o_orderstatus").distinct().count()
    val nPrio = ords.select("o_orderpriority").distinct().count()
    val nBoth = ords.select("o_orderstatus", "o_orderpriority").distinct().count()
    assert(rows.length === nStatus + nPrio + nBoth + 1)
    // the grand-total row aggregates everything
    val total = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(total.length === 1 && total.head.getLong(4) === ords.count())
  }
}
