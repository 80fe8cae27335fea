package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded global shuffle + shard assignment — the LAST stage of a
  * training-data pipeline: after dedup/filter/sample/mix, the corpus
  * must be written in a reproducible pseudo-random order, split into N
  * shards, so any run of the pipeline (and any engine) produces the
  * SAME example order for the same seed.
  *
  * Contract (fully deterministic, engine-replayable):
  *  - sort key  = md5(seed || '|' || id) — changing the seed permutes
  *    the corpus; same seed, same order, forever;
  *  - shard     = first 8 hex digits of the key, as an integer,
  *    mod nShards — every shard is a uniform random 1/N subset;
  *  - position  = 1-based rank of the key WITHIN its shard (id is the
  *    tiebreak, unreachable short of an md5 collision).
  *
  * Scale shape: one codegen'd hash projection + one window PARTITIONED
  * BY shard — no global sort, no single-task ordering. At cluster
  * scale the natural write is `repartition($"shard")` +
  * `sortWithinPartitions($"sort_key")` + partitioned parquet, which
  * shuffles once and never funnels the corpus through one task; the
  * per-shard `row_number` here materializes the position explicitly so
  * the order itself is hash-checkable. nShards bounds per-task state
  * (a shard is ~|corpus|/N rows — the caller sizes N so a shard fits
  * a task, exactly like a lane in the laned-prefix family).
  */
object GlobalShuffle {

  /** (shard, pos, id) for every non-null id, plus the hex sort key. */
  def shuffle(df: DataFrame, idCol: Column, seed: String,
              nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val hx = md5(concat(lit(seed), lit("|"), idCol.cast("string")))
    val keyed = df.where(idCol.isNotNull)
      .select(idCol.as("id"), hx.as("sort_key"))
      .withColumn("shard",
        pmod(conv(substring(col("sort_key"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)).cast("int"))
    keyed.withColumn("pos",
      row_number().over(
        Window.partitionBy("shard").orderBy("sort_key", "id"))
        .cast("long"))
  }

  /** Shuffled doc-granularity bin packing — the [[shuffle]] order fed
    * straight into fixed-capacity training bins: within each shard,
    * documents are laid out in seeded-shuffle order and assigned to
    * bin `floor(exclusive_token_prefix / capacity)` — documents never
    * split (the doc-granularity variant; the token-granularity
    * concat-and-split form is `TextAnalysis.packSequences`), so a bin
    * may overflow by at most one document — the standard
    * concat-then-cut-at-doc-boundary packing.
    *
    * Token counts follow the engine convention (whitespace tokens,
    * blank/null = 0, see [[TokenBudget]]). The per-shard prefix is ONE
    * window partitioned by shard — shard size is ~|corpus|/nShards by
    * the hash split, the caller's per-task bound. Output:
    * (shard, bin, pos, id, n_tokens, cum_before) — `cum_before` is the
    * shard-local exclusive token prefix the bin derives from. */
  def packBins(df: DataFrame, idCol: Column, textCol: Column,
               seed: String, nShards: Int, capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    val nTok = when(
      textCol.isNotNull && length(trim(textCol)) > 0,
      size(split(trim(textCol), "\\s+")).cast("long"))
      .otherwise(0L)
    val hx = md5(concat(lit(seed), lit("|"), idCol.cast("string")))
    val keyed = df.where(idCol.isNotNull)
      .select(idCol.as("id"), nTok.as("n_tokens"), hx.as("sort_key"))
      .withColumn("shard",
        pmod(conv(substring(col("sort_key"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)).cast("int"))
    val w = Window.partitionBy("shard").orderBy("sort_key", "id")
    keyed
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("cum_before",
        coalesce(sum("n_tokens").over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $capacity"))
      .select("shard", "bin", "pos", "id", "n_tokens", "cum_before")
  }
}
