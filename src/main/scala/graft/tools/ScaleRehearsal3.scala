package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 data-selection-tier rehearsal: DSIR importance weights,
  * CCNet perplexity triage, and tokenizer fertility at 2M → 20M
  * tokens of synthetic multi-language text — separate from
  * [[ScaleRehearsal]]/[[ScaleRehearsal2]] so new families don't
  * require re-measuring the old ones.
  *
  * The shapes under test: DSIR is one ≤buckets-row model aggregation
  * plus a broadcast-join scoring pass (~linear in tokens); CCNet is
  * the two-scan per-language LM plus a driver-bounded tercile
  * selection (~linear); fertility segments once per UNIQUE word, so
  * with a fixed vocabulary the BPE fold cost is flat while only the
  * (lang, word) count scales.
  *
  * Run: `sbt "runMain graft.tools.ScaleRehearsal3"`. */
object ScaleRehearsal3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scale-rehearsal-3")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val baseDocs = 200000L // x10 tokens/doc -> 2M tokens

    // vocabulary scales with the corpus so the model/unique-word
    // tables grow too — the adversarial direction for the join sides
    def synth(docs: Long): DataFrame = {
      val vocab = math.max(docs / 10, 100L)
      spark.range(docs).select(col("id").as("doc_id"),
        expr(s"""array_join(transform(sequence(1, 10),
          j -> concat('w', pmod(xxhash64(id + j), ${vocab}L))), ' ')""")
          .as("text"),
        concat(lit("l"), pmod(col("id"), lit(5L))).as("lang"))
    }

    def dsirTime(docs: Long): Double = {
      val d = synth(docs)
      val t0 = System.nanoTime()
      val n = graft.operators.Dsir.importanceWeights(d, "doc_id",
        "text", col("lang") === "l0", buckets = 2048).count()
      require(n == docs, s"every doc scores: $n != $docs")
      (System.nanoTime() - t0) / 1e9
    }
    val (dw1, dw10) = (dsirTime(baseDocs), dsirTime(baseDocs * 10))
    println(f"[rehearsal] dsir weights: ${baseDocs} docs ${dw1}%.2f s; " +
      f"${baseDocs * 10} docs ${dw10}%.2f s (${dw10 / dw1}%.1fx, " +
      f"~linear target; 2048-bucket model agg + broadcast scoring join)")

    def ccnetTime(docs: Long): Double = {
      val d = synth(docs)
      val t0 = System.nanoTime()
      val s = graft.textanalysis.PerplexityBuckets.summary(
        d, "doc_id", "text", "lang")
      val rows = s.collect()
      require(rows.map(_.getLong(2)).sum == docs,
        "every doc lands in a bucket")
      require(rows.length == 15, s"5 langs x 3 buckets: ${rows.length}")
      (System.nanoTime() - t0) / 1e9
    }
    val (cc1, cc10) = (ccnetTime(baseDocs), ccnetTime(baseDocs * 10))
    println(f"[rehearsal] ccnet triage: ${baseDocs} docs ${cc1}%.2f s; " +
      f"${baseDocs * 10} docs ${cc10}%.2f s (${cc10 / cc1}%.1fx, " +
      f"~linear target; per-lang LM two-scan + driver-bounded terciles)")

    // fertility: same corpus at 1x/10x but a FIXED vocabulary, so the
    // unique-word segmentation fold is size-invariant — only the
    // (lang, word) occurrence count should scale
    def fertilityTime(docs: Long): Double = {
      val vocab = 20000L
      val d = spark.range(docs).select(col("id").as("doc_id"),
        expr(s"""array_join(transform(sequence(1, 10),
          j -> concat('w', pmod(xxhash64(id + j), ${vocab}L))), ' ')""")
          .as("text"),
        concat(lit("l"), pmod(col("id"), lit(5L))).as("lang"))
      val merges = Seq("w" -> "1", "w1" -> "2", "w" -> "3", "w" -> "4")
      val t0 = System.nanoTime()
      val rows = graft.textanalysis.TokenizerFertility.perLang(
        d, "text", "lang", merges).collect()
      require(rows.length == 5 && rows.map(_.getLong(1)).sum == docs * 10)
      (System.nanoTime() - t0) / 1e9
    }
    val (tf1, tf10) = (fertilityTime(baseDocs), fertilityTime(baseDocs * 10))
    println(f"[rehearsal] tokenizer fertility: ${baseDocs} docs " +
      f"${tf1}%.2f s; ${baseDocs * 10} docs ${tf10}%.2f s " +
      f"(${tf10 / tf1}%.1fx; segmentation runs on the FIXED 20k-word " +
      f"vocab at both sizes — only the occurrence count scales)")

    spark.stop()
  }
}
