package graft.textanalysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
