package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source token-budget curation — the "cap every source at B
  * tokens" step of a mixture build (the token-level sibling of
  * `curate_source_cap`'s doc-count cap): within each source, documents
  * are admitted in a deterministic order (ascending id) until the
  * source's cumulative token count exceeds the budget; the first
  * overflowing document is excluded.
  *
  * The cumulative sum is the [[LanedPrefix.withPrefixGrouped]] shape,
  * NOT `sum() OVER (PARTITION BY source ORDER BY id)`: a single
  * source can be most of a 100 TB corpus, and the window form funnels
  * that whole source through one task. Here each source's id domain
  * lanes by its own equi-depth cuts, every window partitions by
  * (source, lane), and the cross-lane offsets come off the bounded
  * per-(source, lane) totals — scalable in both the source count and
  * the per-source size.
  *
  * Output: (source, id, n_tokens, cum_tokens) for the KEPT documents,
  * `cum_tokens` inclusive. Ids must be non-negative (they lane
  * through a numeric sketch); empty docs count 0 tokens and are kept
  * wherever their id falls. */
object TokenBudget {
  def cap(df: DataFrame, sourceCol: String, idCol: String,
          textCol: String, budget: Long, k: Int = 1024,
          nLanes: Int = 32): DataFrame = {
    val nTok = when(
      col(textCol).isNotNull && length(trim(col(textCol))) > 0,
      size(split(trim(col(textCol)), "\\s+")).cast("long"))
      .otherwise(0L)
    val vals = df
      .where(col(sourceCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(sourceCol).as("__src"), col(idCol).as("__id"))
      .agg(sum(nTok).as("__n"))
    val (cum, _) = LanedPrefix.withPrefixGrouped(vals, "__src", "__id",
      Seq("__n"), k, nLanes, inclusive = true)
    cum.where(col("__n_cum") <= budget)
      .select(col("__src").as("source"), col("__id").as(idCol),
        col("__n").as("n_tokens"), col("__n_cum").as("cum_tokens"))
  }
}
