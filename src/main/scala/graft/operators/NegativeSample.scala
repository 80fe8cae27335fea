package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Md5Prefix

/** Deterministic negative sampling — the contrastive-training
  * counterpart of the positive (user, item) pairs: for every user, up
  * to `k` pseudo-random items the user has NOT interacted with, drawn
  * reproducibly (same rows whatever the partitioning, retries, or
  * engine — the property a replayable training-data pipeline needs;
  * `df.sample`'s partition-seeded RNG has none of it).
  *
  * Per user, candidate j (j < k + margin) is
  * `md5(user|j) mod nItems` — the same 15-hex-digit md5→long family
  * every deterministic sampler here uses, replayable in any engine
  * with an md5. Candidates collapse to their first draw (min j per
  * (user, item) — a hash collision never yields a duplicate pair),
  * positives drop via one anti-join on (user, item), and the first k
  * surviving draws per user win (draw order, so adding margin never
  * changes which negatives the first k are — downward-closed like the
  * hash-threshold samplers).
  *
  * A user whose positives blanket the candidate space can yield fewer
  * than k negatives: the caller sees the shortfall in the output
  * (raise `margin` — each unit costs one extra candidate row per user
  * BEFORE the anti-join, nothing after). Shape: one explode (bounded:
  * users × (k + margin)), one self-contained dedup aggregate, one
  * anti-join, one per-user window over ≤ k + margin rows. Output:
  * (user, neg_item, draw) with draw the winning j. */
object NegativeSample {
  def apply(positives: DataFrame, userCol: Column, itemCol: Column,
            nItems: Long, k: Int, margin: Int = 8): DataFrame = {
    require(nItems > 0, s"nItems must be positive, got $nItems")
    require(k >= 1, s"k must be >= 1, got $k")
    require(margin >= 0, s"margin must be >= 0, got $margin")
    val pos = positives
      .select(userCol.cast("long").as("user"),
        itemCol.cast("long").as("item"))
      .where(col("user").isNotNull && col("item").isNotNull)
    val users = pos.select("user").distinct()
    val cands = users
      .select(col("user"),
        explode(sequence(lit(0), lit(k + margin - 1))).as("j"))
      .withColumn("item",
        pmod(Md5Prefix(concat_ws("|", col("user"), col("j")), 15), lit(nItems)))
      .groupBy("user", "item").agg(min("j").as("draw"))
    val w = Window.partitionBy("user").orderBy("draw")
    cands.join(pos, Seq("user", "item"), "left_anti")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select(col("user"), col("item").as("neg_item"), col("draw"))
  }
}
