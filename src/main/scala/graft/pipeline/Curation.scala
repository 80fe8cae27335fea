package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.operators.{HashSample, SampleHash, Xx64}
import graft.textanalysis.TextAnalysis

/** End-to-end training-data curation: the composition a user of this
  * library runs over a raw document corpus —
  *
  *   dedup (LSH representatives; exact duplicates subsumed by the digest
  *   collapse) -> language filter -> quality filter -> deterministic
  *   sample -> stats
  *
  * Every stage is one of the engine's scale-shaped operators (digest
  * hash-agg, digest-collapsed banded LSH, single-pass column
  * expressions, hash-threshold sampling), so the whole pipeline is a
  * handful of shuffles regardless of corpus size, and re-running it on
  * the same input reproduces the same output bit-for-bit (every stage
  * is deterministic — no `rand()` anywhere).
  */
object Curation {

  /** Which dedup stage opens the pipeline. */
  sealed trait DedupMode
  /** Digest-collapsed banded MinHash LSH representatives — the near-dup
    * production path (exact duplicates subsumed). xxhash64-based, so no
    * external engine can replay it; verified by spec + internal oracle. */
  case object LshNearDup extends DedupMode
  /** EXACT word-set-digest dedup only (md5 keep-min-id). Every stage of
    * the pipeline is then recomputable by any SQL engine — the mode the
    * oracle-checked `pipeline_curation` gate runs. */
  case object ExactOnly extends DedupMode

  case class Config(
      minhashBands: Int = 8,
      numHashes: Int = 64,
      languages: Seq[String] = Seq("en", "es"),
      minQuality: Double = 0.5,
      sampleFraction: Double = 1.0,
      dedupMode: DedupMode = LshNearDup,
      sampleHash: SampleHash = Xx64)

  case class Result(curated: DataFrame, stats: DataFrame)

  /** The columns `run` adds to the corpus. Inputs must not already carry
    * them: `withColumn` would silently overwrite user data. */
  val derivedColumns: Seq[String] = Seq("lang", "quality", "n_tokens")

  /** Per-language corpus stats over a curated frame. Public so callers
    * that persist the curated output can derive stats FROM the persisted
    * frame (reusing the cache) instead of from the pre-persist plan. */
  def statsOf(curated: DataFrame): DataFrame =
    curated.groupBy("lang").agg(
      count(lit(1)).as("docs"),
      sum("n_tokens").as("tokens"),
      round(avg("quality"), 4).as("avg_quality"))
      .orderBy("lang")

  /** @param docs corpus with `idCol` and `textCol` columns */
  def run(docs: DataFrame, idCol: String, textCol: String,
          cfg: Config = Config()): Result = {
    require(cfg.numHashes % cfg.minhashBands == 0,
      s"numHashes (${cfg.numHashes}) must be divisible by minhashBands " +
        s"(${cfg.minhashBands}) — otherwise trailing hashes are silently unused")
    val clash = derivedColumns.filter(docs.columns.contains)
    require(clash.isEmpty,
      s"input corpus already has column(s) ${clash.mkString(", ")}, which " +
        "Curation derives — rename or drop them before curating")
    // 1. dedup. LshNearDup: LSH representatives decide keep/drop without
    // materializing pairs; EXACT dedup is subsumed (the digest collapse
    // carries min(id), so only the first copy of an exact-duplicate
    // group survives — a separate exactGroups pre-pass would add a
    // corpus-wide aggregation and change nothing). ExactOnly: keep each
    // digest's min-id row — one hash aggregation + semi join.
    val afterNear = cfg.dedupMode match {
      case LshNearDup =>
        val reps = Dedup.minhashRepresentatives(docs, idCol, textCol,
          cfg.numHashes, cfg.minhashBands)
        docs.join(
          reps.filter(col("is_kept")).select(idCol), Seq(idCol), "left_semi")
      case ExactOnly =>
        docs.join(Dedup.exactGroups(docs, idCol, textCol)
          .select(col("first_id").as(idCol)), Seq(idCol), "left_semi")
    }

    // 2+3. language + quality filters: pure column expressions, one pass
    val scored = afterNear
      .withColumn("lang", TextAnalysis.langId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
    val filtered = scored
      .filter(col("lang").isin(cfg.languages: _*)
        && col("quality") >= cfg.minQuality)

    // 4. deterministic sample (hash threshold — stable across reruns
    // and partitionings; skipped entirely at fraction 1.0)
    val sampled =
      if (cfg.sampleFraction >= 1.0) filtered
      else HashSample(filtered, cfg.sampleFraction, Seq(idCol), cfg.sampleHash)

    // 5. corpus stats per language: one hash aggregation
    Result(sampled, statsOf(sampled))
  }
}
