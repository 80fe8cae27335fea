package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 rehearsal: the winnowed ExactSubstr chain vs the full gram
  * chain — wall clock AND total shuffle-write bytes at 10k and 100k
  * docs (~2M → 20M chars), on the same half-the-docs-share-a-72-char-
  * boilerplate corpus as ScaleRehearsal4. The claim under test is the
  * round-17 verdict item: minimizer pre-selection cuts BOTH gram-sized
  * shuffles ~w/2× while the output stays byte-identical (asserted here
  * via full-output checksums, not just counts).
  *
  * Run: `sbt "runMain graft.tools.ScaleRehearsal5"`. */
object ScaleRehearsal5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scale-rehearsal-5")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); ()
        }
      }
    })

    val boiler = (1 to 8).map(i => s"BOILER$i..").mkString // 72 chars

    /** Every `dupEvery`-th doc carries the shared 72-char block:
      * dupEvery=2 is ScaleRehearsal4's heavy-duplication corpus (the
      * candidate mass is then bounded by the REAL duplication, which
      * dominates the minimized chain's shuffle); dupEvery=20 is the
      * light-duplication regime where the cut approaches the ~w/2
      * minimizer-density asymptote. */
    def synth(docs: Long, dupEvery: Int): DataFrame =
      spark.range(docs).select(col("id").as("doc_id"),
        concat(
          expr("""array_join(transform(sequence(1, 12),
            j -> substr(md5(concat(id, '|', j)), 1, 10)), '')"""),
          when(pmod(col("id"), lit(dupEvery.toLong)) === 0, lit(boiler))
            .otherwise(expr("substr(md5(concat(id, '|odd')), 1, 8)")),
          expr("substr(md5(concat(id, '|tail')), 1, 16)")).as("text"))

    /** Full-output checksum: (n_docs, Σ n_removed, xor of row hashes) —
      * byte-identity evidence, not just counts. */
    def checksum(out: DataFrame): (Long, Long, Long) = {
      val r = out
        .select(col("doc_id"), col("n_removed"), col("clean_text"))
        .agg(count(lit(1)), sum("n_removed"),
          expr("bit_xor(xxhash64(doc_id, n_removed, clean_text))"))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    def run(name: String,
            f: DataFrame => DataFrame,
            docs: Long, dupEvery: Int): (Double, Long, (Long, Long, Long)) = {
      val d = synth(docs, dupEvery)
      // drain in-flight listener events from the previous run
      Thread.sleep(1500)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val cs = checksum(f(d))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the last task-end events land
      (wall, shuffleBytes.get(), cs)
    }

    val full = (d: DataFrame) =>
      graft.textanalysis.TextAnalysis.exactSubstrDedup(
        d, "doc_id", "text", minLen = 50)
    val mini = (d: DataFrame) =>
      graft.textanalysis.TextAnalysis.exactSubstrDedupMinimized(
        d, "doc_id", "text", minLen = 50, k = 8)

    // warmup both paths
    run("warmup-full", full, 1000L, 2)
    run("warmup-mini", mini, 1000L, 2)

    // default ladder: 10k/100k at 1/2 duplication + 100k at 1/20; args
    // override as "docs:dupEvery" pairs — e.g. a 10k:2 100k:2 1000000:2
    // three-decade run settles whether the 10x-docs wall ratio is a
    // fixed scheduling/codegen floor amortizing out (ratios climb
    // toward 10x as the linear term dominates) or real superlinearity
    // (ratios exceed 10x)
    val ladder: Seq[(Long, Int)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        val Array(d, e) = a.split(":"); (d.toLong, e.toInt)
      }
      else Seq((10000L, 2), (100000L, 2), (100000L, 20))
    for ((docs, dupEvery) <- ladder) {
      val (tf, bf, cf) = run("full", full, docs, dupEvery)
      val (tm, bm, cm) = run("mini", mini, docs, dupEvery)
      require(cf == cm,
        s"minimized output diverged from full at $docs docs: $cf vs $cm")
      println(f"[rehearsal] exact-substr $docs%6d docs (1/$dupEvery " +
        f"duplicated): " +
        f"full ${tf}%6.2f s / ${bf / 1e6}%8.1f MB shuffled; " +
        f"minimized ${tm}%6.2f s / ${bm / 1e6}%8.1f MB shuffled " +
        f"(wall ${tf / tm}%.2fx, shuffle ${bf.toDouble / bm}%.1fx " +
        f"smaller; outputs checksum-identical)")
    }

    spark.stop()
  }
}
