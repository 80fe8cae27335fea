package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated n-gram spans — the substring-dedup signal
  * of Lee et al., "Deduplicating Training Data Makes Language Models
  * Better" (arXiv:2107.06499), at word-n-gram granularity: find every
  * maximal token span whose n-grams all occur in at least one OTHER
  * document. Unlike `text_dup_spans` (within-doc repetition) this is
  * the corpus-level memorization signal: boilerplate, license
  * headers, syndicated paragraphs.
  *
  * Shape — never all-pairs, never a suffix array:
  *   1. gram construction is array arithmetic on the scan
  *      (`transform(sequence(...))` + one posexplode — no window, no
  *      shuffle);
  *   2. the duplicated-gram set is ONE grouped aggregation
  *      (`count(distinct doc) >= 2`, map-side combined; at 100 TB the
  *      gram key would hash to a digest first — the md5-replayable
  *      trade used across the dedup family — which only narrows the
  *      shuffle, it does not change the plan);
  *   3. hit positions re-join the gram table (hash equi-join);
  *   4. span merging is gaps-and-islands per document — windows
  *      partitioned by doc_id (high-cardinality key; a task never
  *      holds more than one document's hits).
  *
  * Output: (id, span_start, span_end, span_tokens), token positions
  * 0-based inclusive; overlapping/adjacent gram intervals merge into
  * one maximal span. */
object NgramSpans {
  def spans(df: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val hits = dupGramHits(df, idCol, textCol, n)
    val wPrev = Window.partitionBy("__doc").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("__doc").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, 0)
    hits
      .withColumn("__pmax", max("__e").over(wPrev))
      // a new island starts when this interval can't touch any earlier
      // one (adjacency merges too: contiguous duplicated text is one
      // span even when the gram runs meet end-to-end)
      .withColumn("__brk",
        when(col("__pmax").isNull || col("__s") > col("__pmax") + 1, 1L)
          .otherwise(0L))
      .withColumn("__gid", sum("__brk").over(wCum))
      .groupBy(col("__doc"), col("__gid"))
      .agg(min("__s").as("span_start"), max("__e").as("span_end"))
      .select(col("__doc").as(idCol),
        col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("long")
          .as("span_tokens"))
  }

  /** Per-document duplicated-token coverage — the curation cut signal
    * ("drop docs that are mostly boilerplate"): fraction of each doc's
    * tokens inside a cross-doc duplicated span. Docs with no spans
    * report 0; output (id, n_tokens, dup_tokens, dup_frac). */
  def coverage(df: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame = {
    val perDoc = spans(df, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(sum("span_tokens").as("dup_tokens"))
    df.where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol),
        size(split(trim(col(textCol)), "\\s+")).cast("long")
          .as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (floor(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double") * 1e6 + 0.5) / 1e6)
          .as("dup_frac"))
  }

  /** (doc, gram start, gram end) for every gram that occurs in >= 2
    * distinct documents.
    *
    * Round-19 shape (guide §2.3/§2.4):
    *   - grams shuffle as md5 FINGERPRINTS, not strings — the digest
    *     narrows both the duplicated-gram aggregation and the hit join
    *     from the ~25-40-byte gram to a fixed-width key. Round 20
    *     widened the key from the 60-bit prefix to the FULL 16-byte
    *     digest: this gate's oracle groups by the gram STRING, and at
    *     ~10^12 grams a 60-bit key expects ~10^5 birthday collisions
    *     (each silently marking a unique gram duplicated) while the
    *     full digest's expectation is ~10^-15 — output now matches the
    *     string semantics up to that negligible probability, at every
    *     SF, for +8 bytes on an already-slim key;
    *   - "occurs in >= 2 distinct docs" is min(doc) != max(doc) — one
    *     map-side-combined aggregate instead of count(distinct)'s
    *     expand;
    *   - the slim (doc, pos, fp) stream pins ONCE: the aggregate and
    *     the join-back hash the same key but their exchange children
    *     differ (partial agg vs project), so exchange reuse cannot
    *     span them and each would re-run the tokenize+explode+digest
    *     pass over the corpus. */
  private def dupGramHits(df: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val arr = split(trim(col(textCol)), "\\s+")
    val base = df
      .where(col(textCol).isNotNull && length(trim(col(textCol))) > 0 &&
        col(idCol).isNotNull)
      .select(col(idCol).as("__doc"), arr.as("__arr"))
      .where(size(col("__arr")) >= n)
    val grams = graft.operators.Checkpoints.pin(
      base.select(col("__doc"),
        posexplode(transform(sequence(lit(0), size(col("__arr")) - n),
          k => concat_ws(" ", slice(col("__arr"), k + 1, lit(n))))))
        .toDF("__doc", "__s", "__gram")
        .select(col("__doc"), col("__s"),
          graft.functions.Md5Prefix.bytes(col("__gram")).as("__fp")))
    val dup = grams.groupBy("__fp")
      .agg(min("__doc").as("__d0"), max("__doc").as("__d1"))
      .where(col("__d0") =!= col("__d1"))
      .select("__fp")
    grams.join(dup, "__fp")
      .select(col("__doc"), col("__s"), (col("__s") + n - 1).as("__e"))
  }
}
