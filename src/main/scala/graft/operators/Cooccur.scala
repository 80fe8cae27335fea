package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent co-occurring pairs — market-basket mining with the A-Priori
  * prune: which items appear together in at least `minSupport` baskets
  * (products per order, tags per document, tokens per query). The
  * downward-closure property ("a frequent pair's items are frequent")
  * is what makes this tractable at 100 TB: infrequent items — the long
  * tail that dominates the pair space quadratically — are filtered out
  * BEFORE any pair is generated, so the self-join runs only over
  * frequent-item occurrences.
  *
  * Shape: (1) collapse to distinct (basket, item) — an item repeated in
  * one basket counts once — with a map-side combined aggregate;
  * (2) count items, keep those with ≥ minSupport baskets; (3) prune
  * occurrences to frequent items (equi-join on item; AQE broadcasts the
  * frequent set when it is small, and the join stays a plain shuffle
  * join when a low threshold makes it large — no driver collect either
  * way); (4) self-join pruned occurrences on the basket with
  * `item_a < item_b` and count pairs. Pair generation is quadratic only
  * in each basket's FREQUENT-item count; a basket of hot items is the
  * irreducible skew (same caveat as `FuzzyJoin`'s hot blocks — raise
  * minSupport or pre-cap baskets upstream if one basket holds thousands
  * of frequent items).
  *
  * Output: (item_a, item_b, pair_cnt) with item_a < item_b,
  * pair_cnt ≥ minSupport. */
object Cooccur {
  def frequentPairs(df: DataFrame, basketCol: Column, itemCol: Column,
                    minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val occ = df.select(basketCol.as("b"), itemCol.as("i"))
      .where(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    val freq = occ.groupBy("i").agg(count(lit(1)).as("icnt"))
      .where(col("icnt") >= minSupport)
      .select("i")
    val pruned = occ.join(freq, "i").select("b", "i")
    pruned.as("l")
      .join(pruned.as("r"),
        col("l.b") === col("r.b") && col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .where(col("pair_cnt") >= minSupport)
  }
}
