package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained binary text classifier (the fastText-style quality /
  * language gate of an LLM curation pipeline, reduced to its scalable
  * core): Laplace-smoothed per-token class likelihoods, combined per
  * document as the MEAN smoothed likelihood ratio.
  *
  * Derivation: the reference's per-column categorical profiling
  * (`value_counts`-style state summaries in the browser view) extended
  * to the supervised-scoring surface a training-data pipeline needs.
  *
  * Two deliberate deviations from the textbook Naive Bayes, both for
  * cross-engine reproducibility (the house rule shared with
  * [[TextAnalysis.lmScore]] and [[TextAnalysis.tfidfTopTerms]]):
  *  - the model stores the likelihood RATIO r(w) = p⁺(w)/(p⁺(w)+p⁻(w))
  *    and a document scores avg r(w) — addition and division only.
  *    `ln` (the log-likelihood sum) differs by ulps across libm
  *    implementations and would break hash parity after rounding;
  *  - unseen tokens score the neutral 0.5 instead of a prior — the
  *    scorer needs ONLY the model table, no side state.
  *
  * Shape at scale: training is one explode + one map-side-combined
  * groupBy (shuffle = vocabulary, not corpus tokens) + a 1-row totals
  * aggregate broadcast back. The model IS a DataFrame — version it,
  * store it, broadcast-join it. Scoring is one explode + one hash join
  * against the vocabulary-sized model + a per-doc aggregate; AQE
  * demotes the join to broadcast whenever the vocabulary is bounded.
  */
object NaiveBayes {

  /** Train on `df` rows where `labelCol` (boolean) marks the positive
    * class: per-token counts in each class plus the alpha-smoothed
    * likelihood ratio. One row per vocabulary token. */
  def train(df: DataFrame, textCol: String, labelCol: Column,
            alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    val toks = df.where(col(textCol).isNotNull &&
        length(trim(col(textCol))) > 0)
      .select(labelCol.as("__pos"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
    // pin the vocabulary-sized count table (round 19, guide §2.4): the
    // totals reduce and the ratio projection are two readers — each
    // re-ran the corpus tokenize + token-count shuffle unpinned
    val counts = graft.operators.Checkpoints.pin(toks.groupBy("token")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("c_neg")))
    val totals = counts.agg(sum("c_pos").as("__np"),
      sum("c_neg").as("__nn"), count(lit(1)).as("__v"))
    val pPos = (col("c_pos") + lit(alpha)) /
      (col("__np") + lit(alpha) * col("__v"))
    val pNeg = (col("c_neg") + lit(alpha)) /
      (col("__nn") + lit(alpha) * col("__v"))
    counts.crossJoin(broadcast(totals))
      .select(col("token"), col("c_pos"), col("c_neg"),
        (pPos / (pPos + pNeg)).as("ratio"))
  }

  /** Score each document against a [[train]]ed model: the mean likelihood
    * ratio of its tokens (unseen tokens neutral at 0.5), rounded to 4
    * decimals arithmetically (floor(x·10⁴+0.5)/10⁴ — identical in any
    * engine), plus the >0.5 class decision. Blank/null docs score the
    * neutral 0.5. */
  def score(model: DataFrame, df: DataFrame, idCol: String,
            textCol: String): DataFrame = {
    val round4 = (c: Column) => floor(c * 10000.0 + 0.5) / 10000.0
    val toks = df
      .select(col(idCol),
        explode(when(col(textCol).isNotNull &&
            length(trim(col(textCol))) > 0,
          TextAnalysis.tokens(col(textCol)))
          .otherwise(array())).as("token"))
    toks.join(model.select(col("token"), col("ratio")), Seq("token"), "left")
      .groupBy(idCol)
      .agg(round4(avg(coalesce(col("ratio"), lit(0.5)))).as("nb_score"))
      .join(df.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("nb_score"), lit(0.5)).as("nb_score"))
      .withColumn("nb_pred", col("nb_score") > 0.5)
  }
}
