package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 scale rehearsal: 2M → 20M datapoints for the laned-prefix
  * consumers (percent-rank, AUC), negative sampling, and sparse-cosine
  * pairs — separate from [[ScaleRehearsal]] so new families don't
  * require re-measuring the old ones.
  *
  * Run: `sbt "runMain graft.tools.ScaleRehearsal2"`. */
object ScaleRehearsal2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scale-rehearsal-2")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sn = 2000000L

    // percent-rank: distinct-value space held at 100k so the 10x
    // corpus exercises the collapse + join-back, not wider lanes
    def rankTime(rows: Long): Double = {
      val df = spark.range(rows).select(col("id"),
        pmod(xxhash64(col("id")), lit(100000L)).cast("double").as("v"))
      val t0 = System.nanoTime()
      val n = graft.operators.RankNormalize(df, "v").count()
      require(n == rows, s"rank rows $n != $rows")
      (System.nanoTime() - t0) / 1e9
    }
    val (rk1, rk10) = (rankTime(sn), rankTime(sn * 10))
    println(f"[rehearsal] percent-rank: $sn rows ${rk1}%.2f s; " +
      f"${sn * 10} rows ${rk10}%.2f s (${rk10 / rk1}%.1fx, ~linear " +
      f"target; 100k distinct values, 32 lanes at either size)")

    // AUC: a planted separable-with-overlap score distribution; the
    // statistic must stay in a sane band at both sizes
    def aucTime(rows: Long): Double = {
      val df = spark.range(rows).select(
        (col("id") % 2 === 0).as("y"),
        (pmod(xxhash64(col("id")), lit(1000L)).cast("double") / 1000.0 +
          when(col("id") % 2 === 0, 0.3).otherwise(0.0)).as("s"))
      val t0 = System.nanoTime()
      val a = graft.operators.Auc.auc(df, col("s"), col("y"))
        .head().getDouble(0)
      require(a > 0.6 && a < 0.8, s"planted AUC out of band: $a")
      (System.nanoTime() - t0) / 1e9
    }
    val (au1, au10) = (aucTime(sn), aucTime(sn * 10))
    println(f"[rehearsal] exact auc: $sn rows ${au1}%.2f s; " +
      f"${sn * 10} rows ${au10}%.2f s (${au10 / au1}%.1fx, ~linear " +
      f"target; ~1300 distinct scores, one closing division)")

    // negative sampling: user count scales with the corpus; work is
    // users x (k + margin) candidates + one anti-join
    def negTime(rows: Long): Double = {
      val users = rows / 20
      val pos = spark.range(rows).select(
        pmod(xxhash64(col("id")), lit(users)).as("u"),
        pmod(xxhash64(col("id") + 3), lit(1000L)).as("i"))
      val t0 = System.nanoTime()
      val n = graft.operators.NegativeSample(pos, col("u"), col("i"),
        nItems = 1000L, k = 4).count()
      require(n > 0, "no negatives")
      (System.nanoTime() - t0) / 1e9
    }
    val (ng1, ng10) = (negTime(sn), negTime(sn * 10))
    println(f"[rehearsal] negative sampling: $sn positives ${ng1}%.2f s" +
      f"; ${sn * 10} positives ${ng10}%.2f s (${ng10 / ng1}%.1fx, " +
      f"~linear target; ${sn / 20} -> ${sn / 2} users x 12 candidates)")

    // sparse cosine: vocab scales with the corpus so per-term df (and
    // hence pair fanout per term) stays ~constant — the df window is
    // doing the bounding, not luck
    def spcTime(docs: Long): Double = {
      val vocab = docs / 10 max 100L
      val text = (0 until 12).map(j =>
          concat(lit("t"), pmod(xxhash64(col("id") + j), lit(vocab))))
        .reduce((a, b) => concat(a, lit(" "), b))
      val df = spark.range(docs).select(col("id"), text.as("text"))
      val t0 = System.nanoTime()
      val n = graft.textanalysis.InvertedIndex.sparseCosinePairs(
        df, "id", "text", docs, maxDfFrac = 0.01, minSim = 0.5).count()
      (System.nanoTime() - t0) / 1e9
    }
    val (sp1, sp10) = (spcTime(200000L), spcTime(2000000L))
    println(f"[rehearsal] sparse cosine pairs: 200000 docs ${sp1}%.2f s" +
      f"; 2000000 docs ${sp10}%.2f s (${sp10 / sp1}%.1fx, ~linear " +
      f"target; vocab scales with the corpus, per-term df ~constant)")

    spark.stop()
  }
}
