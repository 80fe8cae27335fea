package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-audited train/val/test splitting — the step between curation
  * and training that a naive `rand() < 0.8` gets silently wrong: when a
  * document's duplicates straddle the split, the eval set leaks into
  * training and benchmark numbers inflate.
  *
  * [[byDigest]] makes EXACT-duplicate leakage structurally impossible:
  * the split is a pure function of the exact-dedup digest
  * ([[graft.dedup.Dedup.wordSetKey]]), so identical copies always land
  * together — no coordination, no shuffle beyond the digest computation
  * (a pure map; deterministic across reruns and engines, unlike a
  * seeded `rand()` whose draw order depends on partitioning).
  * [[leakageReport]] then AUDITS the residual risk exact hashing cannot
  * see: NEAR-duplicate pairs whose endpoints landed in different
  * splits, counted per split from whatever near-dup pair frame the
  * pipeline already produces (MinHash bands, windowed Jaccard,
  * SimHash — the operator is agnostic).
  *
  * At 100 TB: split assignment is map-only; the audit joins the pair
  * frame to the (id, split) assignment twice on the id key and reduces
  * to ≤|splits| rows — both joins shuffle on ids the near-dup stage
  * already shuffled on.
  */
object DatasetSplit {

  /** (id, dedup_key, split) with split ∈ {train, val, test} by
    * `md5-prefix(digest) mod 100`: < trainPct → train, < trainPct +
    * valPct → val, else test. Percent bounds are checked. */
  def byDigest(df: DataFrame, idCol: String, textCol: String,
               trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"bad split percents: train=$trainPct val=$valPct")
    val key = graft.dedup.Dedup.wordSetKey(col(textCol))
    val bucket = pmod(conv(substring(key, 1, 8), 16, 10).cast("long"),
      lit(100L))
    df.select(col(idCol).cast("long").as("id"), key.as("dedup_key"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Per-split report over a [[byDigest]] assignment and a near-dup
    * pair frame: (split, n_docs, n_groups, leak_pairs) where
    * `leak_pairs` counts near-dup pairs with exactly one endpoint in
    * this split and the other elsewhere (each crossing pair is counted
    * once per incident split — the number a gatekeeper wants per eval
    * set). Exact-dup leakage is zero by construction and carries no
    * column. */
  def leakageReport(assign: DataFrame, pairs: DataFrame,
                    idACol: String, idBCol: String): DataFrame = {
    val perSplit = assign.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("dedup_key")).as("n_groups"))
    val crossing = pairs
      .join(assign.select(col("id").as("__ia"), col("split").as("__sa")),
        col(idACol) === col("__ia"))
      .join(assign.select(col("id").as("__ib"), col("split").as("__sb")),
        col(idBCol) === col("__ib"))
      .where(col("__sa") =!= col("__sb"))
      .select(explode(array(col("__sa"), col("__sb"))).as("split"))
      .groupBy("split").agg(count(lit(1)).as("__leaks"))
    perSplit.join(crossing, Seq("split"), "left")
      .select(col("split"), col("n_docs"), col("n_groups"),
        coalesce(col("__leaks"), lit(0L)).as("leak_pairs"))
  }
}
