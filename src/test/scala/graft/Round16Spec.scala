package graft

import org.apache.spark.sql.functions._
import graft.operators.MixPlan
import graft.sinks.XlsWriter

/** Property pins for the round-16 interop/guard batch: the CFB
  * directory's declared stream size, sheet-name collision rejection,
  * and mixture-plan duplicate-source rejection. */
class Round16Spec extends SparkTestBase {
  import spark.implicits._

  /** Size field (offset 120) of the `Workbook` directory entry — the
    * entry is located by its UTF-16LE name at a 128-byte boundary, the
    * way a strict CFB reader walks the directory. */
  private def declaredWorkbookSize(bytes: Array[Byte]): Int = {
    val name = "Workbook".flatMap(c => Seq(c.toByte, 0.toByte)).toArray
    val base = Iterator.from(512, 128)
      .takeWhile(_ + 128 <= bytes.length)
      .find(off => name.indices.forall(i => bytes(off + i) == name(i)))
      .getOrElse(fail("no Workbook directory entry"))
    java.nio.ByteBuffer.wrap(bytes, base + 120, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
  }

  test("CFB declares the TRUE stream length for regular-layout streams " +
    "over the cutoff (strict readers must not see padding as content)") {
    val big = XlsWriter.workbookStreamBytes(Seq("B" ->
      (1 to 2000).map(i => (i.toLong, s"fila_$i")).toDF("k", "s")))
    assert(big.length >= 4096 && big.length % 512 != 0,
      "fixture must need padding for the claim to bite")
    assert(declaredWorkbookSize(XlsWriter.cfb(big)) === big.length)
    // under the cutoff the regular layout must declare the 4096 floor —
    // a smaller declared size sends compliant readers to the mini-stream
    val small = XlsWriter.workbookStreamBytes(Seq("S" ->
      Seq((1L, "uno")).toDF("k", "s")))
    assert(small.length < 4096)
    assert(declaredWorkbookSize(XlsWriter.cfb(small)) === 4096)
    // and the mini layout declares exactly the true length
    assert(declaredWorkbookSize(XlsWriter.cfb(small, mini = true)) ===
      small.length)
  }

  test("xls writer rejects sheet names that collide AFTER sanitization") {
    val df = Seq((1L, "a")).toDF("k", "s")
    val e = intercept[IllegalArgumentException] {
      XlsWriter.workbookStreamBytes(Seq("Plan:1" -> df, "Plan*1" -> df))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("ivfAppend is a pure extension: re-assigning the indexed corpus " +
    "against the frozen centroids reproduces its assignment, and drift " +
    "counts are exact") {
    import graft.similarity.Similarity
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d =>
        math.cos((i % 6 + 1).toDouble * (d + 1)) + (i % 7) * 0.01))
    }.toDF("vec_id", "embedding")
    val base = vecs.where(col("vec_id") % 3 =!= 0L)
    val batch = vecs.where(col("vec_id") % 3 === 0L)
    val (assigned, cents) = Similarity.ivfIndex(base, "vec_id",
      "embedding", dim = 8, nlist = 4, iters = 1)
    // identity: appending the base itself lands every row in its own cell
    val re = Similarity.ivfAppend(cents, base, "vec_id", "embedding", 4)
      .select(col("vec_id"), col("__cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val orig = assigned.select(col("vec_id"), col("__cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(re === orig)
    // drift: per-cell counts reconcile with the two inputs
    val appended = Similarity.ivfAppend(cents, batch, "vec_id",
      "embedding", 4)
    val drift = Similarity.ivfDrift(assigned, appended).collect()
    val appCells = appended.groupBy("__cell").count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(drift.map(r => r.getLong(0) -> r.getLong(2)).toMap === appCells)
    drift.foreach { r =>
      val expect = math.floor(
        r.getLong(2).toDouble / r.getLong(1) * 1e6 + 0.5) / 1e6
      assert(r.getDouble(3) === expect)
    }
    assert(drift.map(_.getLong(2)).sum === batch.count())
  }

  test("es-PE currency gate lanes: grouping, half-up rounding, en-dash " +
    "null placeholder") {
    import graft.functions.GraftFunctions
    val got = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1234567.0), (2L, 1200.5), (3L, null), (4L, 0.49))
      .toDF("k", "v")
      .select(col("k"), GraftFunctions.formatCurrency(col("v")).as("s"))
      .orderBy("k").collect().map(_.getString(1)).toSeq
    assert(got === Seq("S/ 1,234,567", "S/ 1,201", "–", "S/ 0"))
  }

  test("dup weights: every doc kept, weight = 1/multiplicity, mass per " +
    "group sums to ~1") {
    import graft.dedup.Dedup
    val df = Seq((1L, "a b"), (2L, "b a"), (3L, "b  a "), (4L, "c"),
      (5L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.dupWeights(df, "doc_id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // docs 1-3 share the {a,b} word set (order/dup/space-insensitive)
    assert(got.toSeq === Seq((1L, 3L, 0.333333), (2L, 3L, 0.333333),
      (3L, 3L, 0.333333), (4L, 1L, 1.0), (5L, 1L, 1.0)))
  }

  test("dataset split: exact copies can never straddle a split, near-dup " +
    "leakage is counted once per incident split") {
    import graft.operators.DatasetSplit
    val docs = Seq((1L, "a b"), (2L, "b a"), (3L, "x y z"), (4L, "p q"),
      (5L, "m n o")).toDF("doc_id", "text")
    val assign = DatasetSplit.byDigest(docs, "doc_id", "text", 80, 10)
    val bySplit = assign.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(bySplit(1L) === bySplit(2L),
      "identical word sets must land in the same split")
    assert(assign.count() === 5)
    // force a known leak: pretend (1,3) and (4,5) are near-dup pairs
    val pairs = Seq((1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val rep = DatasetSplit.leakageReport(assign, pairs, "id_a", "id_b")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rep.values.map(_._1).sum === 5L, "every doc in exactly one split")
    assert(rep.values.map(_._3).sum % 2 === 0L,
      "each crossing pair is counted once per incident split (even total)")
    val expectedLeaks = Seq((1L, 3L), (4L, 5L))
      .count { case (a, b) => bySplit(a) != bySplit(b) } * 2L
    assert(rep.values.map(_._3).sum === expectedLeaks)
    // leakage of an empty pair frame is zero everywhere
    val none = DatasetSplit.leakageReport(assign,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b")
    assert(none.collect().forall(_.getLong(3) == 0L))
    intercept[IllegalArgumentException] {
      DatasetSplit.byDigest(docs, "doc_id", "text", 90, 10)
    }
  }

  test("curation-4 composition: duplication-corrected masses reconcile " +
    "exactly across splits") {
    val docs = Seq((1L, "en", "a b"), (2L, "en", "b a"), (3L, "es", "x"),
      (4L, "en", "p q r")).toDF("doc_id", "lang", "text")
    docs.createOrReplaceTempView("__r16d_docs")
    val rows = graft.queries.Round16d.defs("pipeline_curation4")(spark,
      writeTmpTable(docs))
    val got = rows.agg(sum("n_docs"), sum("n_tokens"), sum("w_docs_ppm"),
      sum("w_tokens_ppm")).head()
    // group {1,2}: wppm 500000 each; singletons 1e6; tokens 2,2,1,3
    assert(got.getLong(0) === 4L && got.getLong(1) === 8L)
    assert(got.getLong(2) === 3000000L, "w_docs mass = 3 effective docs")
    assert(got.getLong(3) === 6000000L,
      "w_tokens mass = 2 + 1 + 3 effective tokens")
  }

  /** Round16d's gate reads documents.parquet from a dir — stage the
    * fixture the same way. */
  private def writeTmpTable(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("r16d").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("mix plan rejects duplicate sources in the weight spec (they " +
    "would duplicate join rows and skew the normalization)") {
    val df = Seq(("en", "one two"), ("fr", "trois")).toDF("src", "text")
    intercept[IllegalArgumentException] {
      MixPlan.plan(df, col("src"), col("text"),
        Seq("en" -> 0.4, "en" -> 0.2), 100L)
    }
    // (the TVF parser's own duplicate guard is pinned in
    // ExtensionsRegistrationSpec, where the extension session exists)
  }
}
