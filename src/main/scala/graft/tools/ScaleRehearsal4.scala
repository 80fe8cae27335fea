package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 rehearsal: character-level ExactSubstr dedup at 2M → 20M
  * duplicated-gram datapoints — separate from the earlier rehearsals
  * so new families don't require re-measuring the old ones.
  *
  * The shape under test: one char-position explode (linear in corpus
  * characters), a map-side-combined gram-fingerprint count, a join
  * back on the fingerprint partitioning, and a per-doc bounded
  * interval merge. The adversarial direction is duplication itself —
  * a boilerplate block shared by a growing share of docs fattens both
  * the count hot keys (map-side combine absorbs them) and the mark
  * lists (bounded by each doc's own length, never by corpus size) —
  * so the rehearsal plants the SAME 72-char block in half the docs at
  * both sizes and checks the wall clock stays ~linear in docs.
  *
  * Run: `sbt "runMain graft.tools.ScaleRehearsal4"`. */
object ScaleRehearsal4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scale-rehearsal-4")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~200 chars/doc -> 10k docs ~= 2M chars ~= 1.5M grams
    val baseDocs = 10000L
    val boiler = (1 to 8).map(i => s"BOILER$i..").mkString // 72 chars

    def synth(docs: Long): DataFrame =
      spark.range(docs).select(col("id").as("doc_id"),
        concat(
          // 120 unique chars from the doc id stream
          expr("""array_join(transform(sequence(1, 12),
            j -> substr(md5(concat(id, '|', j)), 1, 10)), '')"""),
          // the shared 72-char boilerplate block in every even doc
          when(pmod(col("id"), lit(2L)) === 0, lit(boiler))
            .otherwise(expr("substr(md5(concat(id, '|odd')), 1, 8)")),
          expr("substr(md5(concat(id, '|tail')), 1, 16)")).as("text"))

    def substrTime(docs: Long): (Double, Long) = {
      val d = synth(docs)
      val t0 = System.nanoTime()
      val out = graft.textanalysis.TextAnalysis.exactSubstrDedup(
        d, "doc_id", "text", minLen = 50)
      val agg = out.agg(count(lit(1)), sum("n_removed")).head()
      val (n, removed) = (agg.getLong(0), agg.getLong(1))
      require(n == docs, s"every doc reports: $n != $docs")
      // every even doc except the canonical one loses at least the
      // 72-char block; a few chars more when trailing hex before the
      // block birthday-collides across docs and extends the gram cover
      require(removed >= (docs / 2 - 1) * 72,
        s"boilerplate must cut: removed=$removed")
      ((System.nanoTime() - t0) / 1e9, removed)
    }
    substrTime(1000L) // JIT/codegen warmup so the 1x/10x ratio is real
    val (t1, r1) = substrTime(baseDocs)
    val (t10, r10) = substrTime(baseDocs * 10)
    println(f"[rehearsal] exact-substr dedup: ${baseDocs} docs " +
      f"(${r1} chars cut) ${t1}%.2f s; ${baseDocs * 10} docs " +
      f"(${r10} chars cut) ${t10}%.2f s (${t10 / t1}%.1fx, ~linear " +
      f"target; gram explode + map-side-combined count + bounded " +
      f"per-doc merge)")

    // JPEG tier: pure CPU-bound codec work — the spreadIds shuffle is
    // what keeps it parallel on a compact id scan, so wall clock must
    // scale ~linearly in ids with all cores busy
    def jpegTime(ids: Long): Double = {
      val d = spark.range(ids).select(col("id").as("doc_id"))
      val t0 = System.nanoTime()
      val ok = graft.multimodal.Multimodal.jpegDHashes(d, "doc_id", 0.9f)
        .toDF().agg(count(lit(1))).head().getLong(0)
      require(ok == ids, s"every id hashes: $ok != $ids")
      (System.nanoTime() - t0) / 1e9
    }
    jpegTime(2000L) // warmup
    val (j1, j10) = (jpegTime(20000L), jpegTime(200000L))
    println(f"[rehearsal] jpeg lossy dHash: 20000 ids ${j1}%.2f s; " +
      f"200000 ids ${j10}%.2f s (${j10 / j1}%.1fx, ~linear target; " +
      f"encode+decode+dHash per id after the spreadIds exchange)")

    spark.stop()
  }
}
