package graft.textanalysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark decontamination: remove training documents that overlap an
  * evaluation set in word n-grams — the standard guard against test-set
  * leakage in a training-data pipeline (the GPT-3/PaLM 13-gram rule is
  * this operator with a larger `n`).
  *
  * Scale shape: the benchmark side is evaluation data — thousands to a
  * few million n-grams, dwarfed by a 100 TB corpus — so its distinct
  * gram set BROADCASTS and the corpus-side match is a map-side
  * broadcast semi-join on the exploded gram stream. The corpus never
  * shuffles before matching; only the (doc, matched-gram) hits — a
  * vanishingly small stream when contamination is rare — reach the
  * aggregation. If the benchmark ever outgrows broadcast range, the
  * same plan runs as a shuffle semi-join keyed on the gram.
  */
object Decontaminate {

  /** Per-document contamination evidence: the number of DISTINCT
    * benchmark n-grams each corpus document contains. Only contaminated
    * documents appear (hit-free documents produce no join output). */
  def contaminationHits(corpus: DataFrame, idCol: String, textCol: String,
                        benchmark: DataFrame, benchTextCol: String,
                        n: Int = 3): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val benchGrams = benchmark
      .select(explode(TextAnalysis.ngrams(col(benchTextCol), n)).as("__gram"))
      .distinct()
    corpus
      .select(col(idCol), explode(TextAnalysis.ngrams(col(textCol), n)).as("__gram"))
      .join(broadcast(benchGrams), Seq("__gram"))
      .groupBy(col(idCol))
      .agg(countDistinct("__gram").as("n_hits"))
  }

  /** [[contaminationHits]] with a Bloom-filter prefilter on the corpus
    * gram stream — the scale path when the benchmark gram set outgrows
    * broadcast range.
    *
    * The broadcast semi-join in [[contaminationHits]] ships the full
    * distinct benchmark gram STRINGS to every executor; a 13-gram
    * benchmark suite at GPT-3 scale is tens of GB of strings — too big
    * to broadcast, forcing the whole exploded corpus gram stream (≫
    * corpus size) through a shuffle join. A Bloom filter of the same
    * set is ~1.2 GB at 1B grams / 1% fpp (n·ln(1/fpp)/ln²2 bits) and
    * keeps the corpus side map-local: each corpus gram probes the
    * broadcast filter and only probable hits — true hits plus an fpp
    * fraction of the stream — reach the exact verify join. The verify
    * join against the true gram set makes the final answer EXACT (false
    * positives are dropped there), so the filter only buys plan shape,
    * never changes results: this is the sketch-prefilter / exact-verify
    * pattern, same as [[graft.dedup.Dedup.minhashNearDups]]'s fused
    * verification.
    *
    * The filter is built with `DataFrame.stat.bloomFilter` (distributed
    * aggregation; only the fixed-size bit array reaches the driver) and
    * re-broadcast as a task binary. The probe is the codegen'd
    * [[graft.functions.BloomMightContain]] expression holding the
    * broadcast handle, so the prefilter stage stays inside whole-stage
    * codegen end to end.
    */
  def contaminationHitsBloom(corpus: DataFrame, idCol: String, textCol: String,
                             benchmark: DataFrame, benchTextCol: String,
                             n: Int = 3, fpp: Double = 0.01): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    require(fpp > 0 && fpp < 1, "fpp must be in (0,1)")
    val spark = corpus.sparkSession
    val benchGrams = benchmark
      .select(explode(TextAnalysis.ngrams(col(benchTextCol), n)).as("__gram"))
      .distinct()
    // Benchmark side is small by contract (evaluation data); two passes
    // over it (count for sizing + filter build) cost nothing vs the corpus.
    val nGrams = math.max(benchGrams.count(), 1L)
    val filter: BloomFilter = benchGrams.stat.bloomFilter("__gram", nGrams, fpp)
    val bcast = spark.sparkContext.broadcast(filter)
    corpus
      .select(col(idCol), explode(TextAnalysis.ngrams(col(textCol), n)).as("__gram"))
      .filter(graft.functions.BloomMightContain(col("__gram"), bcast))
      // exact verify: false positives die here; no broadcast hint — at
      // scale the planner shuffles two already-small sides.
      .join(benchGrams, Seq("__gram"))
      .groupBy(col(idCol))
      .agg(countDistinct("__gram").as("n_hits"))
  }

  /** The decontaminated corpus: documents with at least `minHits`
    * distinct benchmark n-grams are dropped via a left-anti join on the
    * (small) contaminated-id set; everything else passes through with
    * all columns intact. */
  def clean(corpus: DataFrame, idCol: String, textCol: String,
            benchmark: DataFrame, benchTextCol: String,
            n: Int = 3, minHits: Int = 1): DataFrame = {
    require(minHits >= 1, "minHits must be >= 1")
    val contaminated =
      contaminationHits(corpus, idCol, textCol, benchmark, benchTextCol, n)
        .filter(col("n_hits") >= minHits)
        .select(col(idCol))
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }
}
