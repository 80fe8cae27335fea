package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.operators.HashSample
import graft.textanalysis.TextAnalysis

/** End-to-end training-data curation: the composition a user of this
  * library runs over a raw document corpus —
  *
  *   exact dedup -> near-dup dedup (LSH representatives) -> language
  *   filter -> quality filter -> deterministic sample -> stats
  *
  * Every stage is one of the engine's scale-shaped operators (digest
  * hash-agg, digest-collapsed banded LSH, single-pass column
  * expressions, hash-threshold sampling), so the whole pipeline is a
  * handful of shuffles regardless of corpus size, and re-running it on
  * the same input reproduces the same output bit-for-bit (every stage
  * is deterministic — no `rand()` anywhere).
  */
object Curation {

  case class Config(
      minhashBands: Int = 8,
      numHashes: Int = 64,
      languages: Seq[String] = Seq("en", "es"),
      minQuality: Double = 0.5,
      sampleFraction: Double = 1.0)

  case class Result(curated: DataFrame, stats: DataFrame)

  /** @param docs corpus with `idCol` and `textCol` columns */
  def run(docs: DataFrame, idCol: String, textCol: String,
          cfg: Config = Config()): Result = {
    // 1. exact dedup: keep the first id of every identical word-set
    val exactKept = Dedup.exactGroups(docs, idCol, textCol)
      .select(col("first_id").as(idCol))
    val afterExact = docs.join(exactKept, Seq(idCol), "left_semi")

    // 2. near-dup dedup: LSH representatives (keep/drop without pairs)
    val reps = Dedup.minhashRepresentatives(afterExact, idCol, textCol,
      cfg.numHashes, cfg.minhashBands)
    val afterNear = afterExact.join(
      reps.filter(col("is_kept")).select(idCol), Seq(idCol), "left_semi")

    // 3+4. language + quality filters: pure column expressions, one pass
    val scored = afterNear
      .withColumn("lang", TextAnalysis.langId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
    val filtered = scored
      .filter(col("lang").isin(cfg.languages: _*)
        && col("quality") >= cfg.minQuality)

    // 5. deterministic sample (hash threshold — stable across reruns
    // and partitionings; skipped entirely at fraction 1.0)
    val sampled =
      if (cfg.sampleFraction >= 1.0) filtered
      else HashSample(filtered, cfg.sampleFraction, Seq(idCol))

    // 6. corpus stats per language: one hash aggregation
    val stats = sampled.groupBy("lang").agg(
      count(lit(1)).as("docs"),
      sum("n_tokens").as("tokens"),
      round(avg("quality"), 4).as("avg_quality"))
      .orderBy("lang")

    Result(sampled, stats)
  }
}
