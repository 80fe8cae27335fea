package graft.textanalysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the classic corpus-level quality
  * signal: train add-1-smoothed unigram probabilities on the corpus
  * itself, then score each document by its mean token log-probability
  * (low = the doc's vocabulary is unusual for the corpus: boilerplate
  * markup, foreign-language leakage, codes/ids — the cheap first cut
  * before a real LM perplexity pass).
  *
  * Two scans, both aggregation-shaped: one grouped token count builds
  * the model (map-side combined; the vocab table is what it is — at
  * 100 TB it stays a DataFrame and the scoring join hash-partitions,
  * broadcast when small), one token→model equi-join + per-doc mean
  * scores. `ln((c+1)/(T+V))` is evaluated per DISTINCT token inside
  * the model table, not per occurrence, so the transcendental runs
  * |vocab| times; the per-doc mean rounds at the edge (1e-4 — log
  * sums are order-associative only to ulp). Output:
  * (id, n_tokens, avg_logprob); empty docs produce no row. */
object UnigramLm {
  def scoreDocs(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // pins (round 19, guide §2.4): `toks` feeds the model aggregation
    // AND the scoring join; `model` feeds the totals reduce AND the
    // log-prob projection — all separate readers that each re-ran the
    // corpus tokenize (resp. the vocab aggregation) unpinned
    val toks = graft.operators.Checkpoints.pin(df
      .where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("__w")))
    val model = graft.operators.Checkpoints.pin(
      toks.groupBy("__w").agg(count(lit(1)).as("__c")))
    val stats = model.agg(sum("__c").as("__T"),
      count(lit(1)).as("__V"))
    val scoredVocab = model.crossJoin(broadcast(stats))
      .select(col("__w"),
        log((col("__c") + 1).cast("double") /
          (col("__T") + col("__V")).cast("double")).as("__lp"))
    toks.join(scoredVocab, "__w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (floor(avg("__lp") * 1e4 + 0.5) / 1e4).as("avg_logprob"))
  }
}
