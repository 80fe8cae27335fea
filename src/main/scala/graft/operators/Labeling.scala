package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The labeling-panel suite around [[Kappa]]: once a pipeline has
  * multiple labelers per item (human panels, model ensembles, old-vs-new
  * prompts), three questions follow the agreement number —
  * WHICH label does each item get ([[consensus]]), WHICH rater can be
  * trusted ([[raterAccuracy]]), and how reliable is the panel when
  * items carry DIFFERENT rater counts ([[krippendorffAlpha]], the
  * missing-data generalization Fleiss' constant-panel design can't
  * express).
  *
  * All three are one-or-two grouped counts over (item, label) — map-side
  * combined, never a driver loop — and every cross-row accumulation is
  * INTEGER (or a bounded fold over per-rater-count classes), so the
  * DuckDB oracles replay bit-for-bit at 1e-6 rounding.
  */
object Labeling {

  /** Per-item (item, label) counts with null ratings dropped. */
  private def cells(df: DataFrame, itemCol: Column,
                    labelCol: Column): DataFrame =
    cellsFromRatings(df.select(itemCol.cast("string").as("item"),
        labelCol.cast("string").as("label"))
      .where(col("item").isNotNull && col("label").isNotNull))

  /** (item, label) counts over an already-normalized ratings frame. */
  private def cellsFromRatings(ratings: DataFrame): DataFrame =
    ratings.groupBy("item", "label").agg(count(lit(1)).as("c"))

  /** Normalized (item, rater, label) ratings — null-rater rows dropped
    * alongside null items/labels, so every downstream frame (consensus,
    * accuracy, weights) sees the SAME population as the oracle. One
    * eager pin here is what makes [[raterAccuracy]]/
    * [[weightedConsensus]] single-scan: the source is read once and
    * the cells/consensus/join passes replay the materialized frame.
    * The frame is RATINGS-sized (every rating row), so at cluster
    * scale the pin takes the reliable-`checkpoint()` dual via
    * [[Checkpoints.pin]] when a `checkpointDir` is supplied —
    * `localCheckpoint` blocks have no lineage to survive executor
    * loss. */
  private def ratingsFrame(df: DataFrame, itemCol: Column,
                           raterCol: Column, labelCol: Column,
                           checkpointDir: Option[String]): DataFrame =
    Checkpoints.pin(
      df.select(itemCol.cast("string").as("item"),
          raterCol.cast("string").as("rater"),
          labelCol.cast("string").as("label"))
        .where(col("item").isNotNull && col("rater").isNotNull &&
          col("label").isNotNull),
      checkpointDir)

  /** Majority-vote consensus per item, deterministic tie-break: the
    * winning label is the most-voted one, smallest label lexically on
    * a tie (a FIXED rule both engines replay — an arbitrary `first()`
    * would hash-drift). Output: (item, label, votes, total,
    * confidence = votes/total, unanimous). One grouped count plus one
    * min-of-struct reduce — the (−votes, label) struct orders by votes
    * DESC then label ASC, so a single `min` picks the winner without a
    * window or a second shuffle. */
  def consensus(df: DataFrame, itemCol: Column,
                labelCol: Column): DataFrame =
    consensusFromCells(cells(df, itemCol, labelCol))

  private def consensusFromCells(cs: DataFrame): DataFrame =
    cs.groupBy("item")
      .agg(min(struct((-col("c")).as("nc"), col("label").as("l")))
        .as("win"),
        sum("c").as("total"))
      .select(col("item"), col("win.l").as("label"),
        (-col("win.nc")).as("votes"), col("total"),
        (floor(((-col("win.nc")).cast("double") /
          col("total").cast("double")) * 1e6 + 0.5) / 1e6)
          .as("confidence"),
        ((-col("win.nc")) === col("total")).as("unanimous"))

  /** Per-rater reliability against the panel's own consensus: for each
    * rater, how many of their ratings match the [[consensus]] label of
    * the item they rated. The blind-spot number a labeling pipeline
    * watches per annotator (and per model version). Input: one row per
    * (item, rater, label) rating. Shape: the consensus frame is
    * |items| rows joined back on the item key (the planner broadcasts
    * it when small; at 10^9 items it is a co-partitioned shuffle join —
    * both correct), then one grouped count per rater. */
  def raterAccuracy(df: DataFrame, itemCol: Column, raterCol: Column,
                    labelCol: Column,
                    checkpointDir: Option[String] = None): DataFrame =
    raterAccuracyFrom(
      ratingsFrame(df, itemCol, raterCol, labelCol, checkpointDir))

  /** [[raterAccuracy]] over a pre-materialized [[ratingsFrame]]. The
    * consensus is computed from the SAME rater-filtered frame the
    * accuracy counts use (a null-rater rating can neither vote nor be
    * scored — the oracle's semantics), so the source is scanned once. */
  private def raterAccuracyFrom(ratings: DataFrame): DataFrame = {
    val cons = consensusFromCells(cellsFromRatings(ratings))
      .select(col("item"), col("label").as("__consensus"))
    ratings.join(cons, "item")
      .groupBy("rater")
      .agg(count(lit(1)).as("n"),
        sum(when(col("label") === col("__consensus"), 1L).otherwise(0L))
          .as("n_match"))
      .select(col("rater"), col("n"), col("n_match"),
        (floor((col("n_match").cast("double") / col("n").cast("double"))
          * 1e6 + 0.5) / 1e6).as("accuracy"))
  }

  /** One reliability-reweighting round on top of [[consensus]] — the
    * Dawid–Skene-lite step every labeling pipeline eventually takes:
    * first pass, plain majority; second pass, each rater votes with
    * their round-1 [[raterAccuracy]] as weight, so a trusted rater
    * outvotes two noisy ones. Weights are the 1e6-SCALED accuracies as
    * LONGS, so the per-label weight sums are exact integers and the
    * (weighted votes DESC, label ASC) tie-break replays on any engine
    * — a float-weighted sum would make the winner depend on fold
    * order at equality. Shape: the |raters|-row weight table joins
    * back to the ratings (broadcast at any real panel size), then the
    * same grouped-count + min-of-struct reduce as [[consensus]].
    * Output: (item, label, w_votes, votes, total). */
  def weightedConsensus(df: DataFrame, itemCol: Column, raterCol: Column,
                        labelCol: Column,
                        checkpointDir: Option[String] = None): DataFrame = {
    val ratings =
      ratingsFrame(df, itemCol, raterCol, labelCol, checkpointDir)
    val weights = raterAccuracyFrom(ratings)
      .select(col("rater"),
        floor(col("accuracy") * 1e6 + 0.5).cast("long").as("__w"))
    ratings.join(broadcast(weights), "rater")
      .groupBy("item", "label")
      .agg(sum("__w").as("wv"), count(lit(1)).as("c"))
      .groupBy("item")
      .agg(min(struct((-col("wv")).as("nwv"), col("label").as("l"),
          (-col("c")).as("nc"))).as("win"),
        sum("c").as("total"))
      .select(col("item"), col("win.l").as("label"),
        (-col("win.nwv")).as("w_votes"), (-col("win.nc")).as("votes"),
        col("total"))
  }

  /** Krippendorff's alpha, nominal data — panel reliability when items
    * carry DIFFERENT numbers of ratings (the real shape of labeling
    * queues: some items double-keyed, some triple-keyed, some dropped):
    * α = 1 − D_o/D_e over the PAIRABLE units (n_u ≥ 2 ratings; a
    * single rating has no within-unit pair and is excluded, per the
    * definition).
    *
    *   D_o ∝ Σ_u [Σ_c n_uc·(n_u − n_uc)] / (n_u − 1)
    *   D_e ∝ (n² − Σ_c n_c²) / (n(n−1)),   n = Σ_pairable n_u
    *
    * Exactness: the per-unit disagreement Σ_c n_uc(n_u − n_uc) is an
    * INTEGER, and units sharing a rater count m share the denominator
    * (m − 1) — so the only float accumulation is a fold over the
    * RATER-COUNT CLASSES (one term per distinct panel size, a handful
    * of doubles folded in ascending-m order via an `aggregate` HOF on
    * a sorted bounded array — the [[Holt]] cross-engine-fold
    * convention), never a float sum over data-sized rows. Margins and
    * class sums accumulate in DECIMAL(38,0). Output: one row
    * (n_units, n_ratings, d_o, d_e, alpha), 1e-6-rounded; degenerate
    * D_e = 0 (every pairable rating one label) yields α = 1 when
    * D_o = 0 by the same convention as [[Kappa]]. */
  def krippendorffAlpha(df: DataFrame, itemCol: Column,
                        labelCol: Column,
                        checkpointDir: Option[String] = None): DataFrame = {
    // ≤ |items|·|labels| rows (items-sized at scale); feeds units +
    // margins — reliable-checkpoint dual like the ratings frame
    val cs = Checkpoints.pin(cells(df, itemCol, labelCol), checkpointDir)
    val units = Checkpoints.pin(
      cs.groupBy("item")
        .agg(sum("c").as("nu"), sum(col("c") * col("c")).as("s2"))
        .where(col("nu") >= 2L),
      checkpointDir) // one row per pairable unit
    // per unit: Σ_c n_uc(n_u − n_uc) = n_u² − Σ_c n_uc²; class-sum by m
    val classes = units.groupBy(col("nu").as("m"))
      .agg(count(lit(1)).as("units"),
        sum((col("nu") * col("nu") - col("s2")).cast("decimal(38,0)"))
          .as("disagree"))
    val classAgg = classes
      .agg(array_sort(collect_list(struct(col("m"), col("units"),
        col("disagree").cast("double").as("d")))).as("__cl"))
      .select(
        expr("aggregate(__cl, 0.0D, (acc, x) -> acc + x.d / (x.m - 1))")
          .as("do_sum"),
        expr("aggregate(__cl, 0L, (acc, x) -> acc + x.m * x.units)")
          .as("n"),
        expr("aggregate(__cl, 0L, (acc, x) -> acc + x.units)")
          .as("n_units"))
    val margins = cs.join(units.select("item"), "item")
      .groupBy("label").agg(sum("c").as("nc"))
      .select((col("nc").cast("decimal(38,0)") *
        col("nc").cast("decimal(38,0)")).as("nc2"))
      .agg(coalesce(sum("nc2"), lit(0).cast("decimal(38,0)")).as("nc2_sum"))
    val n = col("n").cast("double")
    val dO = col("do_sum") / n
    val dE = (n * n - col("nc2_sum").cast("double")) / (n * (n - 1.0))
    val alpha = when(dE === 0.0, when(dO === 0.0, 1.0).otherwise(0.0))
      .otherwise(lit(1.0) - dO / dE)
    classAgg.crossJoin(broadcast(margins))
      .where(col("n_units") > 0)
      .select(col("n_units"), col("n").as("n_ratings"),
        (floor(dO * 1e6 + 0.5) / 1e6).as("d_o"),
        (floor(dE * 1e6 + 0.5) / 1e6).as("d_e"),
        (floor(alpha * 1e6 + 0.5) / 1e6).as("alpha"))
  }
}
