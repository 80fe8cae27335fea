package graft.textanalysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer health per language — the fertility/compression audit a
  * multilingual training run does before committing to a tokenizer:
  * segment the corpus with the learned BPE merges and report, per
  * language, how many subword tokens a word costs (fertility) and how
  * many characters/bytes a token carries (compression). Languages the
  * tokenizer under-serves show high fertility — they pay more sequence
  * length for the same text.
  *
  * Shape at scale: one grouped (lang, word) count over the corpus
  * (map-side combined), segmentation ONCE per unique word (the
  * [[BpeTrain.segment]] pure-map fold over the distinct-word table,
  * never per occurrence), one equi-join back, one per-lang aggregate.
  * All accumulation is exact long arithmetic; the three ratios are
  * ppm floor-divisions of exact longs, so the result replays
  * bit-for-bit. */
object TokenizerFertility {

  def perLang(df: DataFrame, textCol: String, langCol: String,
              merges: Seq[(String, String)]): DataFrame = {
    val words = df
      .where(col(textCol).isNotNull && length(trim(col(textCol))) > 0 &&
        col(langCol).isNotNull)
      .select(col(langCol).as("lang"),
        explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
    val cnt = words.groupBy("lang", "w").agg(count(lit(1)).as("__occ"))
    val seg = BpeTrain.segment(cnt.select("w").distinct(), "w", merges)
      .select(col("w"), size(col("bpe_tokens")).cast("long").as("__nbpe"))
    cnt.join(seg, "w")
      .groupBy("lang")
      .agg(sum("__occ").as("n_words"),
        sum(col("__occ") * col("__nbpe")).as("n_bpe_tokens"),
        sum(col("__occ") * length(col("w")).cast("long")).as("n_chars"),
        sum(col("__occ") * octet_length(col("w")).cast("long"))
          .as("n_bytes"))
      .withColumn("fertility_ppm",
        expr("(n_bpe_tokens * 1000000) div n_words"))
      .withColumn("chars_per_token_ppm",
        expr("(n_chars * 1000000) div n_bpe_tokens"))
      .withColumn("bytes_per_token_ppm",
        expr("(n_bytes * 1000000) div n_bpe_tokens"))
  }
}
