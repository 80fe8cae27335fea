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
  * change feed): keep a (key, `cnt`, `v_sum`) aggregate table current by
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
  */
object IncrementalAgg {
  def maintain(base: DataFrame, changes: DataFrame, keyCol: String,
               oldCol: String, newCol: String): DataFrame = {
    val delta = changes.groupBy(keyCol).agg(
      sum(when(col(newCol).isNotNull, 1).otherwise(0) -
        when(col(oldCol).isNotNull, 1).otherwise(0)).as("__dc"),
      sum(coalesce(col(newCol), lit(0.0)) - coalesce(col(oldCol), lit(0.0)))
        .as("__ds"))
    base.join(delta, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__dc"), lit(0L)))
          .as("cnt"),
        (coalesce(col("v_sum"), lit(0.0)) + coalesce(col("__ds"), lit(0.0)))
          .as("v_sum"))
      .filter(col("cnt") > 0)
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
