package graft.textanalysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Out-of-vocabulary rate — the tokenizer-fit signal: build the
  * corpus's own top-K vocabulary and score each document by the
  * fraction of its tokens that fall outside it. High OOV flags docs
  * whose token distribution the tokenizer (or a downstream fixed
  * vocab) will shred into bytes: codes, foreign scripts, OCR noise.
  *
  * Shape: one grouped token count (map-side combined) feeds a top-K
  * selection that plans as `TakeOrderedAndProject` — no global sort —
  * and the K-row vocab broadcasts into a left join against the token
  * stream; per-doc aggregation closes it. The vocab is deterministic
  * under ties (count desc, token asc), so any engine derives the same
  * K tokens and the rate replays exactly. */
object Oov {

  /** The corpus's top-`k` tokens by frequency, ties broken by token
    * text ascending: (token, c). */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    tokensOf(df, textCol)
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("__w").asc)
      .limit(k)
      .select(col("__w").as("token"), col("c"))

  /** Per-document OOV stats against the corpus top-`k` vocab:
    * (id, n_tokens, n_oov, oov_rate). Empty docs produce no row;
    * `oov_rate` rounds at the edge (1e-6). */
  def oovRate(df: DataFrame, idCol: String, textCol: String, k: Int)
      : DataFrame = {
    val vocab = vocabTopK(df, textCol, k)
      .select(col("token").as("__w"), lit(1).as("__in"))
    df.where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .join(broadcast(vocab), Seq("__w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        floor(col("n_oov").cast("double") /
          col("n_tokens").cast("double") * 1e6 + 0.5) / 1e6)
  }

  private def tokensOf(df: DataFrame, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("__w"))
}
