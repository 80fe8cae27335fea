package graft

import org.apache.spark.sql.functions._
import graft.operators.{Compaction, Md5, TemperatureMixture}

/** Compaction planner invariants + temperature-mixture quota math. */
class CompactionMixtureSpec extends SparkTestBase {
  import spark.implicits._

  test("compaction bins: order-preserving, target-bounded, lossless") {
    val rnd = new scala.util.Random(3)
    val stats = (0L until 500L).map(f => (f, 1000L + rnd.nextInt(9000)))
      .toDF("file_id", "bytes")
    val target = 50000L
    val planned = Compaction.planBins(stats, "file_id", "bytes", target,
      bucketWidth = 64)
    val rows = planned.select("file_id", "bytes", "bin")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // bins are non-decreasing in file order (no interleaving)
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 <= b._3 })
    val maxFile = rows.map(_._2).max
    val byBin = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val lastBin = byBin.keys.max
    byBin.foreach { case (b, tot) =>
      if (b != lastBin)
        assert(tot > target - maxFile && tot <= target + maxFile,
          s"bin $b total $tot outside (target-max, target+max]")
    }
    // lossless: every file exactly once
    assert(rows.map(_._1).toSeq === (0L until 500L))
    assert(byBin.values.sum === rows.map(_._2).sum)
  }

  test("temperature mixture: quotas join as data, guard bounds collect") {
    // the per-source quota must travel as a broadcast-joined TABLE —
    // a literal when/otherwise chain is O(|sources|) deep in generated
    // code and overflows codegen at a few thousand sources
    val df = (0 until 1200).flatMap(s =>
        (0 until 3).map(i => (f"s$s%04d", s * 3 + i)))
      .toDF("src", "id")
    val out = TemperatureMixture(df, "src", total = 1200L, Seq("id"))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("CASE WHEN"),
      "quota must not be a per-source literal CASE chain")
    assert(out.count() > 0)
    assert(out.columns.toSeq === Seq("src", "id"), "column order kept")
    // the maxSources guard fires BEFORE materializing every source
    val e = intercept[IllegalArgumentException] {
      TemperatureMixture(df, "src", total = 10L, Seq("id"),
        maxSources = 100)
    }
    assert(e.getMessage.contains("more than 100 sources"))
  }

  test("temperature mixture: sqrt quotas, head flattened, exact sets") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = 200L
    val out = TemperatureMixture(docs, "lang", total, Seq("doc_id"),
      hash = Md5)
    val counts = docs.groupBy("lang").count()
      .as[(String, Long)].collect().sortBy(_._1)
    val weights = counts.map { case (_, n) => math.sqrt(n.toDouble) }
    val bigW = weights.sum
    val wantQuota = counts.zip(weights).map { case ((l, n), w) =>
      l -> math.min(n, math.floor(total * w / bigW).toLong)
    }.toMap
    val got = out.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(got === wantQuota.filter(_._2 > 0))
    // the head language's sampled share is below its natural share
    val (headLang, headN) = counts.maxBy(_._2)
    val naturalShare = headN.toDouble / counts.map(_._2).sum
    val sampledShare = got(headLang).toDouble / got.values.sum
    assert(sampledShare < naturalShare)
    // deterministic: same call, same rows
    val again = TemperatureMixture(docs, "lang", total, Seq("doc_id"),
      hash = Md5).select("doc_id").as[Long].collect().sorted
    assert(again.toSeq ===
      out.select("doc_id").as[Long].collect().sorted.toSeq)
  }
}
