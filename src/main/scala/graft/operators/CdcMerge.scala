package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lakehouse-style MERGE: apply a changelog (CDC stream) to a snapshot.
  *
  * Semantics, per key: the change with the greatest `seqCols` tuple wins
  * ("last writer wins").
  *   - winning op == `deleteOp`: the key is absent from the result, even
  *     if it existed in the base;
  *   - winning op != `deleteOp`: the key is present, with each column in
  *     `setCols` taken FROM THE CHANGE (update/insert), every other base
  *     column carried through (null for keys new to the base);
  *   - key untouched by the changelog: the base row passes unchanged.
  * Output schema == base schema. This is the batch form of applying a
  * Debezium/ CDC feed, or re-materializing a table from a snapshot +
  * change stream — the maintenance operation behind every incrementally
  * refreshed corpus (the reference's price-update pipeline is the
  * two-column special case of it; cf.
  * `/root/reference/Actualizar_Precios_de_Nexo.py:113-139`, the
  * `max_fecha` keep-latest rule + coalesce update).
  *
  * Scale shape: exactly one shuffle of the changelog — the per-key argmax
  * runs as `max_by(payload, seq)`, a declarative aggregate with map-side
  * partial combine, so a day's billion-row feed collapses to its distinct
  * keys before hitting the wire. The collapsed changelog (≤ one row per
  * touched key) then FULL OUTER joins the base on the key; on a base
  * bucketed/partitioned by key the base side moves nothing, and AQE can
  * demote the join to broadcast when the day's key set is small. No
  * window functions — a `row_number` formulation would shuffle the full
  * feed AND sort each partition; the aggregate form does neither.
  */
/** Incremental aggregate maintenance (classic IVM over a before/after
  * change feed): keep a (key, count, sum) aggregate table current by
  * applying a batch of row-level changes — each carrying its OLD and
  * NEW value (insert: old null; delete: new null; update: both) —
  * without touching the unaffected keys.
  *
  * `cnt`/`sum` are self-maintainable: the batch reduces to one delta
  * row per touched key (map-side-combined aggregation of
  * ±1 / new−old), and one full-outer join applies it. Cost is
  * O(|changes| + |touched keys|) versus O(|table|) recompute — THE
  * reason aggregate dashboards over 100 TB fact tables update in
  * seconds. Keys whose count reaches zero drop out, exactly as a
  * recompute would drop them. Requires faithful before-images (the
  * contract a CDC source like Debezium provides); a feed that lies
  * about old values diverges from recompute — by the same amount it
  * lied.
  *
  * Numeric contract: the sum is maintained in doubles as
  * base + Σ(new−old), which equals a from-scratch recompute only up to
  * floating-point association — consumers comparing against a
  * recompute should round both sides to their reporting precision
  * (the CORRECTNESS gates round to cents, where the ~1-ulp drift of a
  * few thousand accumulations is orders of magnitude below the
  * half-cent boundary). For exact-to-the-bit parity, maintain cents as
  * integers upstream.
  *
  * `min`/`max` are NOT self-maintainable under deletes (removing the
  * stored extremum reveals nothing about the runner-up) — see
  * [[IncrementalAgg.maintainFull]] for the standard hybrid.
  */
object IncrementalAgg {
  /** Maintain a (key, count, sum) aggregate table. `base` must carry
    * `keyCol`, `cntCol` (long) and `sumCol` (double) — the same schema
    * this function returns, so maintenance iterates. */
  def maintain(base: DataFrame, changes: DataFrame, keyCol: String,
               oldCol: String, newCol: String, cntCol: String = "cnt",
               sumCol: String = "v_sum"): DataFrame = {
    require(Seq(keyCol, cntCol, sumCol).forall(base.columns.contains),
      s"base must carry ($keyCol, $cntCol, $sumCol); has " +
        base.columns.mkString(", "))
    val delta = changes.groupBy(keyCol).agg(
      sum(when(col(newCol).isNotNull, 1).otherwise(0) -
        when(col(oldCol).isNotNull, 1).otherwise(0)).as("__dc"),
      sum(coalesce(col(newCol), lit(0.0)) - coalesce(col(oldCol), lit(0.0)))
        .as("__ds"))
    base.join(delta, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col(cntCol), lit(0L)) + coalesce(col("__dc"), lit(0L)))
          .as(cntCol),
        (coalesce(col(sumCol), lit(0.0)) + coalesce(col("__ds"), lit(0.0)))
          .as(sumCol))
      .filter(col(cntCol) > 0)
  }

  /** Maintain a (key, count, sum, min, max) aggregate table — the
    * standard IVM hybrid for the non-self-maintainable extrema:
    *
    *  - count/sum update by pure delta arithmetic (as [[maintain]]);
    *  - min/max update by delta where that is sound — inserts can only
    *    IMPROVE an extremum, so `least(stored, min(inserted))` /
    *    `greatest(stored, max(inserted))` is exact;
    *  - a key is INVALIDATED when a removed old value ties-or-beats its
    *    stored extremum (the runner-up is unknown) or the key is new to
    *    the base while the feed claims removals for it; only those keys
    *    re-aggregate from `detail`, the post-change fact rows.
    *
    * Cost: O(|changes| + |touched keys|) for the delta path plus one
    * semi-join-pruned aggregation of `detail` restricted to the
    * invalidated keys — O(|rows of invalidated keys|), not O(|table|).
    * On a detail store partitioned/bucketed by `keyCol` the semi join
    * prunes at the scan, so a 100 TB fact table contributes only the
    * invalidated keys' partitions. Deletes of non-extreme values never
    * touch `detail` at all.
    *
    * `base` must carry `keyCol`, `cnt`, `v_sum`, `v_min`, `v_max` —
    * the schema this function returns. `detail` must carry `keyCol`
    * and `valCol` and reflect the feed already applied. */
  def maintainFull(base: DataFrame, changes: DataFrame, detail: DataFrame,
                   keyCol: String, valCol: String, oldCol: String,
                   newCol: String): DataFrame = {
    require(Seq(keyCol, "cnt", "v_sum", "v_min", "v_max")
        .forall(base.columns.contains),
      s"base must carry ($keyCol, cnt, v_sum, v_min, v_max); has " +
        base.columns.mkString(", "))
    val delta = changes.groupBy(keyCol).agg(
      sum(when(col(newCol).isNotNull, 1).otherwise(0) -
        when(col(oldCol).isNotNull, 1).otherwise(0)).as("__dc"),
      sum(coalesce(col(newCol), lit(0.0)) - coalesce(col(oldCol), lit(0.0)))
        .as("__ds"),
      min(col(newCol)).as("__ins_min"), max(col(newCol)).as("__ins_max"),
      min(col(oldCol)).as("__del_min"), max(col(oldCol)).as("__del_max"))

    val merged = base.join(delta, Seq(keyCol), "full_outer")
      .withColumn("__cnt",
        coalesce(col("cnt"), lit(0L)) + coalesce(col("__dc"), lit(0L)))
      .withColumn("__sum",
        coalesce(col("v_sum"), lit(0.0)) + coalesce(col("__ds"), lit(0.0)))
      .filter(col("__cnt") > 0)
      // invalidated: a removal may have been the stored extremum
      // (<=/>= rather than = is deliberately conservative — recomputing
      // a still-valid key is correct, missing an invalid one is not),
      // or the base row is absent while the feed removes values
      .withColumn("__invalid",
        (col("cnt").isNull && col("__del_min").isNotNull) ||
        (col("cnt").isNotNull && col("__del_min").isNotNull &&
          (col("__del_min") <= col("v_min") ||
           col("__del_max") >= col("v_max"))))

    // O(touched): re-aggregate ONLY the invalidated keys' detail rows
    val invalidKeys = merged.filter(col("__invalid")).select(keyCol)
    val recomputed = detail
      .join(invalidKeys, Seq(keyCol), "left_semi")
      .groupBy(keyCol)
      .agg(min(col(valCol)).as("__r_min"), max(col(valCol)).as("__r_max"))

    merged.join(recomputed, Seq(keyCol), "left")
      .select(col(keyCol), col("__cnt").as("cnt"), col("__sum").as("v_sum"),
        when(col("__invalid"), col("__r_min"))
          .otherwise(least(col("v_min"), col("__ins_min"))).as("v_min"),
        when(col("__invalid"), col("__r_max"))
          .otherwise(greatest(col("v_max"), col("__ins_max"))).as("v_max"))
  }

  /** Incremental maintenance of a materialized JOIN view
    * `fact ⋈ dim` under a fact-side change batch — the other half of
    * the IVM family next to the aggregate maintainers above.
    *
    * `changes` carries one row per touched fact primary key: `opCol`
    * (anything but `deleteOp` means upsert) plus the NEW fact column
    * values (ignored for deletes). Maintenance is two delta-sized
    * joins around the view itself:
    *
    *  - surviving rows: `view ⟕̸ touched-pk` (left anti) — with the
    *    touched-key set broadcast this is a map-side filter of the
    *    view, and on a view store partitioned by the pk hash it prunes
    *    at the scan;
    *  - replacement rows: upserted fact rows ⋈ `dim` — |Δ|-sized, AQE
    *    demotes to broadcast.
    *
    * Cost O(|view scan-filter| + |Δ|·fanout), never a recompute of
    * `fact ⋈ dim`; the CORRECTNESS gate checks the result equals
    * exactly that recompute. A dim-side delta is the symmetric call
    * with roles swapped; slowly-changing dims are versioned upstream
    * (see the SCD2 operator) so production dim changes arrive as new
    * surrogate keys, i.e. fact-side changes. */
  def maintainJoinView(view: DataFrame, dim: DataFrame, changes: DataFrame,
                       pkCols: Seq[String], factCols: Seq[String],
                       factKey: String, dimKey: String, opCol: String,
                       deleteOp: String = "D"): DataFrame = {
    require(pkCols.nonEmpty, "need at least one fact pk column")
    require(pkCols.forall(factCols.contains),
      "fact pk columns must be part of the fact columns")
    val touched = changes.select(pkCols.map(col): _*).distinct()
    val survivors = view.join(broadcast(touched), pkCols, "left_anti")
    val replacements = changes.where(col(opCol) =!= deleteOp)
      .select(factCols.map(col): _*)
      .join(dim, col(factKey) === col(dimKey))
      .select(view.columns.map(col): _*)
    survivors.unionByName(replacements)
  }
}

object CdcMerge {
  def apply(base: DataFrame, changes: DataFrame, keyCol: String,
            opCol: String, seqCols: Seq[String], setCols: Seq[String],
            deleteOp: String = "D"): DataFrame = {
    require(seqCols.nonEmpty, "need at least one sequence column")
    require(setCols.nonEmpty, "need at least one column to set")
    require(!setCols.contains(keyCol), "key column cannot be a set column")

    // one row per touched key: latest (op, payload) by the seq tuple;
    // struct ordering = lexicographic on seqCols, so ties break on the
    // later columns (callers put a unique id last)
    val payload = struct((opCol +: setCols).map(col): _*)
    val latest = changes
      .groupBy(col(keyCol))
      .agg(max_by(payload, struct(seqCols.map(col): _*)).as("__chg"))

    val joined = base.join(latest, Seq(keyCol), "full_outer")
    val changed = col("__chg").isNotNull
    val kept = joined.filter(!changed || col(s"__chg.$opCol") =!= deleteOp)
    val out = base.columns.map {
      case k if k == keyCol => col(keyCol)
      case c if setCols.contains(c) =>
        when(changed, col(s"__chg.$c")).otherwise(col(c)).as(c)
      case c => col(c)
    }
    kept.select(out: _*)
  }
}
