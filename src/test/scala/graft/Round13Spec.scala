package graft

import org.apache.spark.sql.functions._
import graft.query.ViewServer

/** Round-13 semantic pins: the sink gates' on-disk round trips and the
  * locale-numeric sort's numeric-awareness (the properties the DuckDB
  * hash alone can't articulate). */
class Round13Spec extends SparkTestBase {
  import spark.implicits._

  test("sink_per_project writes one directory per project, nulls survive") {
    val df = queries.Round13.defs("sink_per_project")(spark, sf)
    val rows = df.collect()
    // the write happened as a side effect; inspect the tree it left
    val out = new java.io.File(
      "target/gates/r13/sink_per_project_" +
        sf.replaceAll("[^A-Za-z0-9]", "_"))
    val dirs = out.listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("Proyecto=")) === 25,
      s"expected 25 project partitions, got: ${dirs.toSeq}")
    // '#' in partition values is escaped on disk but unescapes on read
    assert(rows.map(_.getString(0)).distinct.forall(_.startsWith("Brand#")))
    // every-7th-size Estado nulls survive the parquet round trip
    assert(rows.count(_.isNullAt(2)) > 0)
  }

  test("sink_changed_detail keeps exactly the flagged rows") {
    val df = queries.Round13.defs("sink_changed_detail")(spark, sf)
    val back = df.collect()
    assert(back.nonEmpty)
    assert(back.forall(r =>
      r.getBoolean(r.fieldIndex("cambio_precio")) ||
        r.getBoolean(r.fieldIndex("cambio_estado"))))
  }

  test("sink_kpi_json __ALL__ row equals the cards over the source") {
    val df = queries.Round13.defs("sink_kpi_json")(spark, sf)
    val all = df.where(col("proyecto") === "__ALL__").head()
    val src = spark.read.parquet(s"$sf/part.parquet")
      .agg(count(lit(1)), round(avg("p_retailprice"), 2),
        round(median(col("p_retailprice")), 2)).head()
    assert(all.getLong(1) === src.getLong(0))
    assert(all.getDouble(2) === src.getDouble(1))
    assert(all.getDouble(3) === src.getDouble(2))
  }

  test("view_count_by_estado: bars ordered by count, total = project rows") {
    val rows = queries.Round13.defs("view_count_by_estado")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "bars must come back count-descending")
    val expected = spark.read.parquet(s"$sf/part.parquet")
      .where(col("p_brand") === "Brand#7").count()
    assert(counts.sum === expected)
  }

  test("locale-numeric sort ranks by numeric size, not lexical digits") {
    val ranked = queries.Round13.defs("sort_locale_numeric")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val df = ranked.toMap
    def rk(l: String) = df.getOrElse(l, fail(s"label $l missing"))
    // full property: rank order == (numeric size asc, numeric suffix asc)
    val byNumeric = ranked.map(_._1).sortBy { l =>
      val Array(_, size, suffix) = l.split("-")
      (size.toInt, suffix.toInt)
    }
    byNumeric.zipWithIndex.foreach { case (l, i) =>
      assert(rk(l) === i + 1L,
        s"$l should rank ${i + 1} under numeric-aware order")
    }
    // and the gate's ranks agree with the ViewServer method's order
    val labels = spark.read.parquet(s"$sf/part.parquet")
      .select(concat(lit("Torre-"), col("p_size"), lit("-"),
        col("p_partkey") % 4).as("label")).distinct()
    val vs = new ViewServer(labels, "labels_r13")
    val served = vs.sortedByLocaleNumeric(labels, "label")
      .collect().map(_.getString(0))
    vs.close()
    assert(served.zipWithIndex.forall { case (l, i) => rk(l) === i + 1L },
      "gate ranks must replay sortedByLocaleNumeric's order")
  }

  test("ANN recall curve: monotone in nprobe, exact at nprobe = nlist") {
    // nested probe sets: any candidate that outranks a brute-force
    // top-K member is itself a top-K member, so growing the pool can
    // only swap hits for hits — recall never decreases
    val rows = queries.Round13b.defs("sim_ann_recall_curve")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L))
    val rec = rows.map(_._2)
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in nprobe: ${rec.toSeq}")
    assert(rec.last === 1.0, "nprobe = nlist must be the exact identity")
  }

  test("ksGrouped equals per-group global KS; lorenz integrates to 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val base = Seq.fill(3000)((s"g${rnd.nextInt(3)}",
      rnd.nextInt(200).toDouble)).toDF("g", "v")
    val cur = Seq.fill(3000)((s"g${rnd.nextInt(3)}",
      rnd.nextInt(200).toDouble + rnd.nextInt(3))).toDF("g", "v")
    val grouped = graft.operators.KsDrift
      .ksGrouped(base, cur, col("g"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    Seq("g0", "g1", "g2").foreach { g =>
      val solo = graft.operators.KsDrift.ks(
        base.where(col("g") === g), cur.where(col("g") === g), "v")
        .head()
      assert(grouped(g) ===
        ((solo.getDouble(0), solo.getLong(1), solo.getLong(2))),
        s"grouped KS must equal the global KS run on segment $g alone")
    }

    val vals = Seq.fill(500)(rnd.nextInt(1000).toLong).toDF("v")
    val lor = graft.operators.Gini.lorenz(vals, col("v"), points = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(lor.length === 10)
    // shares are non-decreasing in p, end exactly at 1.0, and match a
    // brute-force bottom-r sum at every decile
    val sorted = vals.as[Long].collect().sorted
    val total = sorted.sum.toDouble
    lor.foreach { case (r, share) =>
      val brute = sorted.take(r.toInt).sum / total
      assert(share === math.floor(brute * 1e6 + 0.5) / 1e6,
        s"share at rank $r")
    }
    assert(lor.last._2 === 1.0)
    assert(lor.map(_._2).sliding(2).forall(s => s.head <= s.last))
  }

  test("chunker covers every token; overlap and count formulas hold") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val docs = (1L to 60L).map(i =>
      (i, (1 to (rnd.nextInt(120) + 1)).map(t => s"w${i}_$t")
        .mkString(" "))).toDF("doc_id", "text")
    val size = 40; val overlap = 8; val stride = size - overlap
    val chunks = graft.textanalysis.Chunker
      .chunk(docs, "doc_id", "text", size, overlap)
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    docs.collect().foreach { d =>
      val toks = d.getString(1).split("\\s+")
      val n = toks.length
      val got = chunks(d.getLong(0))
      val wantCount =
        if (n <= size) 1 else 1 + (n - size + stride - 1) / stride
      assert(got.length === wantCount, s"chunk count for n=$n")
      // reassembling chunk k's tokens must equal the slice at k*stride
      got.foreach { c =>
        val k = c.getLong(1).toInt
        val want = toks.slice(k * stride, math.min(k * stride + size, n))
        assert(c.getString(3) === want.mkString(" "), s"chunk $k of n=$n")
      }
      // the last chunk reaches the final token
      assert(got.last.getString(3).endsWith(toks.last))
    }
  }

  test("sink_records_json: omitted null keys come back as nulls") {
    val df = queries.Round13.defs("sink_records_json")(spark, sf)
    assert(df.where(col("estado").isNull).count() > 0)
  }
}
