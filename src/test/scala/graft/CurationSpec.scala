package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Curation

/** End-to-end curation pipeline: exact dedup -> LSH near-dup keep ->
  * language/quality filters -> deterministic sample -> stats.
  */
class CurationSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text")

  test("each stage only removes rows; filters hold on the output") {
    val n0 = docs.count()
    val r = Curation.run(docs, "doc_id", "text",
      Curation.Config(languages = Seq("en", "es", "und"), minQuality = 0.3))
    val kept = r.curated.cache()
    try {
      val n1 = kept.count()
      assert(n1 > 0 && n1 <= n0)
      // output rows are a subset of the input
      assert(kept.select("doc_id").exceptAll(docs.select("doc_id")).count() === 0L)
      // the filters actually hold on every surviving row
      assert(kept.filter(col("quality") < 0.3).count() === 0L)
      assert(kept.filter(!col("lang").isin("en", "es", "und")).count() === 0L)
      // exact duplicates are gone: every word-set digest is unique
      val dups = graft.dedup.Dedup.exactGroups(kept, "doc_id", "text")
        .filter(col("n_docs") > 1).count()
      assert(dups === 0L)
    } finally kept.unpersist()
  }

  test("pipeline is deterministic: identical output across reruns") {
    val cfg = Curation.Config(languages = Seq("en", "es", "und"),
      minQuality = 0.3, sampleFraction = 0.5)
    val a = Curation.run(docs, "doc_id", "text", cfg).curated
    val b = Curation.run(docs.repartition(13), "doc_id", "text", cfg).curated
    assert(a.select("doc_id").exceptAll(b.select("doc_id")).count() === 0L)
    assert(b.select("doc_id").exceptAll(a.select("doc_id")).count() === 0L)
  }

  test("stats aggregate the curated corpus per language") {
    val r = Curation.run(docs, "doc_id", "text",
      Curation.Config(languages = Seq("en", "es", "und"), minQuality = 0.0))
    val statTotal = r.stats.agg(sum("docs")).head().getLong(0)
    assert(statTotal === r.curated.count())
    val langs = r.stats.select("lang").collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es", "und")))
  }
}
