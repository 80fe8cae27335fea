package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Bootstrap, ClassBalance}
import graft.streaming.StreamingHll
import graft.streaming.StreamingHll.{HEvent, HState}

/** Round-13h semantic pins: streaming HLL state = batch end state
  * under any split, lane merge = batch sketch; bootstrap determinism
  * and Poisson sanity; class balance exactness. */
class Round13hSpec extends SparkTestBase {
  import spark.implicits._

  private def hashOf(item: String): Long =
    Seq(item).toDF("x").select(StreamingHll.hashCol(col("x")))
      .head().getLong(0)

  test("StreamingHll fold is order-free and equals the batch end state") {
    val items = (1 to 120).map(i => ("k" + (i % 2), "u" + (i % 37)))
    val want = StreamingHll
      .endStates(items.toDF("k", "u"), "k", "u").collect()
      .map(r => r.getString(0) -> ((r.getSeq[Int](1), r.getLong(2))))
      .toMap
    val rnd = new scala.util.Random(3)
    (1 to 3).foreach { _ =>
      val got = rnd.shuffle(items).groupBy(_._1).map { case (k, rows) =>
        val s = rows.foldLeft(HState(k, Seq.fill(1 << StreamingHll.P)(0), 0L))(
          (acc, r) => StreamingHll.fold(acc, hashOf(r._2)))
        k -> ((s.regs, s.n))
      }
      assert(got === want)
    }
  }

  test("real stream across micro-batches lands on the batch end state") {
    val evs = (1 to 60).map(i =>
      HEvent("k" + (i % 2), hashOf("u" + (i % 23))))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[HEvent]
    val q = StreamingHll.hllStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_hll_test").start()
    val streamed = try {
      val (b1, b2) = evs.splitAt(25)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      spark.table("stream_hll_test").collect()
        .map(r => (r.getString(0), r.getSeq[Int](1), r.getLong(2)))
        .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._3) }
    } finally q.stop()
    val items = (1 to 60).map(i => ("k" + (i % 2), "u" + (i % 23)))
    val want = StreamingHll
      .endStates(items.toDF("k", "u"), "k", "u").collect()
      .map(r => r.getString(0) -> ((r.getSeq[Int](1), r.getLong(2))))
      .toMap
    streamed.foreach { case (k, (_, regs, n)) =>
      assert((regs, n) === want(k))
    }
  }

  test("lane merge equals the batch sketch over the whole feed") {
    val items = (1 to 200).map(i => ("k", "item" + (i % 83)))
    val df = items.toDF("k", "u")
    // two disjoint lanes, merged
    val lanes = StreamingHll.endStates(df.where(length(col("u")) % 2 === 0),
        "k", "u")
      .unionAll(StreamingHll.endStates(
        df.where(length(col("u")) % 2 === 1), "k", "u"))
    val got = StreamingHll.merged(lanes).head()
    val whole = StreamingHll.merged(StreamingHll.endStates(df, "k", "u"))
      .head()
    assert(got.getLong(1) === 200L)
    assert(got.getDouble(2) === whole.getDouble(2),
      "per-bucket max merge must be exact")
    // and the estimate is in a plausible band around 83
    assert(whole.getDouble(2) > 60 && whole.getDouble(2) < 110)
  }

  test("Bootstrap thresholds are the Poisson(1) CDF, multiplicities sane") {
    val t = Bootstrap.Thresholds
    assert(t.length === 7 && t === t.sorted)
    assert(math.abs(t.head.toDouble / math.pow(2.0, 60) -
      math.exp(-1.0)) < 1e-12)
    val reps = Bootstrap.replicateMeans(
      spark.range(10000).toDF("id").withColumn("v", lit(1L)),
      col("id"), col("v"), 8).collect()
    assert(reps.length === 8)
    // each replicate draws ~Poisson(1) per row: n_eff within 5 sigma
    reps.foreach { r =>
      assert(math.abs(r.getLong(1) - 10000L) < 500L,
        s"replicate ${r.getLong(0)} n_eff=${r.getLong(1)}")
      assert(r.getDouble(2) === 1.0) // constant value -> mean exactly 1
    }
  }

  test("Bootstrap.ci orders replicate means and brackets the point") {
    val df = queries.tbl(spark, sf, "lineitem")
    val ci = Bootstrap.ci(df,
      concat_ws("|", col("l_orderkey"), col("l_linenumber")),
      col("l_quantity"), 16, 0.1).head()
    assert(ci.getLong(0) === 16L)
    val (point, lo, hi) = (ci.getDouble(1), ci.getDouble(2),
      ci.getDouble(3))
    assert(lo <= hi)
    assert(lo <= point && point <= hi,
      s"CI [$lo, $hi] should bracket the point $point at this n")
  }

  test("ClassBalance keeps exactly min-class-count rows per class") {
    val docs = queries.tbl(spark, sf, "documents")
    val minC = docs.where(col("lang").isNotNull).groupBy("lang")
      .count().agg(min("count")).head().getLong(0)
    val kept = ClassBalance.downsample(docs, "lang", "doc_id")
    val perClass = kept.groupBy("lang").count().collect()
    assert(perClass.nonEmpty &&
      perClass.forall(_.getLong(1) === minC))
    // deterministic: a second run keeps the identical set
    val again = ClassBalance.downsample(docs, "lang", "doc_id")
    assert(kept.select("doc_id").exceptAll(again.select("doc_id"))
      .isEmpty)
  }
}
