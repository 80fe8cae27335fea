package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Md5Prefix

import graft.dedup.Dedup

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023):
  * score every raw document by how much more likely its hashed
  * bag-of-words is under a TARGET distribution than under the raw
  * pool, then resample the pool toward the target with those weights.
  * The cheap, model-free way to tilt a 100 TB crawl toward a curated
  * domain (the paper's use: tilt CommonCrawl toward Wikipedia/books).
  *
  * Both n-gram models are bucket-hashed multinomials: token →
  * md5-replayable 32-bit hash → one of `buckets` feature buckets, add-1
  * smoothed. The per-document importance log-weight is
  * `Σ_tokens ln p_target(b)/p_raw(b)`, accumulated in ppm INTEGERS: the
  * per-bucket log-ratio is computed once per observed bucket (≤
  * `buckets` transcendentals total), fixed-pointed to `floor(·1e6 +
  * 0.5)`, and the per-doc sum is then exact long arithmetic — the
  * result replays bit-for-bit in any engine regardless of summation
  * order. The ln argument is a ratio of double products whose factors
  * are exact integer-valued doubles — exact up to 2^53 per product and
  * overflow-free at any corpus size (an int64 product would wrap
  * silently at ~1e11 total tokens), so both engines feed ln the
  * identical double.
  *
  * Shape at scale: one token-bucket count aggregation over the corpus
  * (map-side combined, ≤ `buckets` rows out), a 1-row totals frame,
  * then one data-sized shuffle — tokens join the broadcast ≤
  * `buckets`-row log-ratio table and sum per doc. No window over data,
  * no driver collect.
  */
object Dsir {

  /** Per-bucket add-1-smoothed target/raw log-ratio table:
    * (bucket, tgt_cnt, raw_cnt, log_ratio_ppm). ≤ `buckets` rows —
    * broadcastable. `isTarget` marks the in-domain subset (a SUBSET of
    * the pool, per the paper: raw counts include target docs). */
  def logRatios(toks: DataFrame, buckets: Int): DataFrame = {
    // pin the ≤ buckets-row count table (round 19, guide §2.4): the
    // totals reduce and the ratio projection are two readers, and each
    // re-ran the corpus token aggregation unpinned
    val cnt = Checkpoints.pin(toks.groupBy("__b")
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("tgt_cnt"),
        count(lit(1)).as("raw_cnt")))
    val tot = cnt.agg(sum("tgt_cnt").as("__tT"), sum("raw_cnt").as("__rT"))
    // ln( (tgt+1)/(tgtTot+B) / ((raw+1)/(rawTot+B)) ) as one ln over a
    // ratio of exact double products; ppm fixed-point at the edge. Each
    // FACTOR casts to double BEFORE the multiply: an int64 product like
    // (tgt_cnt+1)*(rawTot+B) wraps silently past 2^63 (ANSI off) at
    // ~1e11 total tokens — the 100 TB regime this module targets —
    // while the double product stays exact up to 2^53 and merely rounds
    // (correctly, feeding ln the nearest double) beyond that.
    cnt.crossJoin(broadcast(tot))
      .select(col("__b").as("bucket"), col("tgt_cnt"), col("raw_cnt"),
        floor(log(((col("tgt_cnt") + 1L).cast("double") *
            (col("__rT") + buckets).cast("double")) /
          ((col("raw_cnt") + 1L).cast("double") *
            (col("__tT") + buckets).cast("double")))
          * 1e6 + 0.5).cast("long").as("log_ratio_ppm"))
  }

  /** Exploded (id, target-flag, bucket) token frame — the shared scan
    * both model fitting and scoring run from. Empty/whitespace docs
    * drop (the [[graft.textanalysis.UnigramLm]] convention). */
  private def tokenBuckets(df: DataFrame, idCol: String, textCol: String,
                           isTarget: Column, buckets: Int): DataFrame =
    df.where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), isTarget.as("__t"),
        explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .withColumn("__b", Dedup.md5WordHash32(col("__w")) % buckets)
      .drop("__w")

  /** Per-document DSIR importance log-weights:
    * (id, is_target, n_tokens, logw_ppm), logw_ppm an exact long.
    * Positive = the doc looks more target-like than pool-like. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 2048): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // pin the exploded token stream once (round 19, guide §2.4): the
    // model fit (logRatios) and the scoring join are separate readers
    // — unpinned, each re-ran the corpus tokenize + md5-bucket pass
    val toks = Checkpoints.pin(
      tokenBuckets(df, idCol, textCol, isTarget, buckets))
    val lr = logRatios(toks, buckets)
      .select(col("bucket").as("__b"), col("log_ratio_ppm"))
    toks.join(broadcast(lr), Seq("__b"))
      .groupBy("id")
      .agg(first("__t").as("is_target"),
        count(lit(1)).as("n_tokens"),
        sum("log_ratio_ppm").as("logw_ppm"))
  }

  /** The DSIR paper's own success metric: KL(target ‖ selected) vs
    * KL(target ‖ pool) over the add-1-smoothed hashed-unigram
    * distributions — did the resample actually move the corpus toward
    * the target? `selected` is an id frame (small — a top-k result);
    * everything else is the same one token-bucket aggregation as
    * [[logRatios]] plus a broadcast membership join. Per-bucket KL
    * terms fixed-point to 1e-12 and sum as exact longs (unobserved
    * buckets contribute a closed-form constant term, counted not
    * enumerated). Output one row:
    * (buckets, kl_sel_e12, kl_pool_e12, kl_ratio·1e-6-rounded) —
    * ratio < 1 means the selection is closer to the target. */
  def klReduction(df: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, selected: DataFrame,
                  buckets: Int = 2048): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val toks = tokenBuckets(df, idCol, textCol, isTarget, buckets)
    val sel = selected.select(col("id"), lit(true).as("__sel"))
    // pinned: three readers below (totals, observed terms, the final
    // closed-form projection) each re-ran the corpus aggregation
    val cnt = Checkpoints.pin(toks.join(broadcast(sel), Seq("id"), "left")
      .groupBy("__b")
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("tc"),
        count(lit(1)).as("pc"),
        sum(when(col("__sel"), 1L).otherwise(0L)).as("sc")))
    val tot = cnt.agg(sum("tc").as("__tT"), sum("pc").as("__pT"),
      sum("sc").as("__sT"), count(lit(1)).as("__nObs"))
    // p_t(b)·ln(p_t(b)/p_x(b)) with the ln fed a ratio of exact double
    // products (each factor cast BEFORE the multiply — int64 products
    // wrap past 2^63 at ~1e11 tokens; see logRatios), fixed at 1e-12
    def termE12(xc: Column, xT: Column): Column =
      floor(((col("tc") + 1L).cast("double") /
          (col("__tT") + buckets).cast("double")) *
        log(((col("tc") + 1L).cast("double") *
            (xT + buckets).cast("double")) /
          ((xc + 1L).cast("double") *
            (col("__tT") + buckets).cast("double")))
        * 1e12 + 0.5).cast("long")
    val observed = cnt.crossJoin(broadcast(tot))
      .select(termE12(col("sc"), col("__sT")).as("__ts"),
        termE12(col("pc"), col("__pT")).as("__tp"))
      .agg(sum("__ts").as("__obs_s"), sum("__tp").as("__obs_p"))
    // every never-observed bucket contributes the identical zero-count
    // term: (1/(tT+B))·ln((xT+B)/(tT+B))
    def zeroE12(xT: Column): Column =
      floor((lit(1.0) / (col("__tT") + buckets).cast("double")) *
        log((xT + buckets).cast("double") /
          (col("__tT") + buckets).cast("double")) * 1e12 + 0.5)
        .cast("long")
    observed.crossJoin(broadcast(tot))
      .select(lit(buckets).as("buckets"),
        (col("__obs_s") +
          (lit(buckets.toLong) - col("__nObs")) * zeroE12(col("__sT")))
          .as("kl_sel_e12"),
        (col("__obs_p") +
          (lit(buckets.toLong) - col("__nObs")) * zeroE12(col("__pT")))
          .as("kl_pool_e12"))
      .withColumn("kl_ratio",
        floor(col("kl_sel_e12").cast("double") /
          col("kl_pool_e12").cast("double") * 1e6 + 0.5) / 1e6)
  }

  /** Gumbel top-k importance resampling over [[importanceWeights]]:
    * draw `k` docs WITHOUT replacement with probability ∝ exp(logw/τ)
    * via the Gumbel-max trick — key = logw/τ + Gumbel(0,1), take the k
    * largest (Efraimidis–Spirakis in log space). The Gumbel draw is a
    * deterministic md5 uniform per id (u = (h20+0.5)/2^20, an exact
    * dyadic double), so the selected SET replays across engines and
    * runs. Plans as TakeOrderedAndProject — no global sort, no window.
    * Output: (id, is_target, n_tokens, logw_ppm, key_ppm), the k
    * largest keys, ties to the smaller id. */
  def gumbelTopK(weights: DataFrame, k: Int, tauPpm: Long = 1000000L)
      : DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    withGumbelKey(weights, tauPpm)
      .orderBy(col("key_ppm").desc, col("id"))
      .limit(k)
  }

  /** The Gumbel sampling key alone (`key_ppm` appended) — shared by
    * [[gumbelTopK]] and the streaming selector
    * ([[graft.streaming.StreamingImportance]]), so batch and stream
    * rank by the identical deterministic draw. */
  def withGumbelKey(weights: DataFrame, tauPpm: Long = 1000000L)
      : DataFrame = {
    require(tauPpm > 0, s"tauPpm must be positive, got $tauPpm")
    val h20 = Md5Prefix(concat(lit("g|"),
      col("id").cast("string")), 8) % 1048576L
    val u = (h20.cast("double") + 0.5) / 1048576.0
    val gumbelPpm = floor(-log(-log(u)) * 1e6 + 0.5).cast("long")
    // logw/τ in ppm: floor-div keeps it exact long arithmetic
    val scaled =
      if (tauPpm == 1000000L) col("logw_ppm")
      else expr(s"(logw_ppm * 1000000) div $tauPpm")
    weights.withColumn("key_ppm", scaled + gumbelPpm)
  }
}
