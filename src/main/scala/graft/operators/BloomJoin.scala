package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime-filter join pruning: the distributed analogue of Spark's own
  * runtime row-level filtering / dynamic partition pruning, made
  * explicit and deterministic.
  *
  * A fact ⋉ dim semi join at 100 TB shuffles the entire fact side on
  * the join key before a single dim row is consulted. When the dim side
  * is selective (a filtered dimension), a Bloom filter of its key set —
  * n·ln(1/fpp)/ln²2 bits, fixed-size however wide the fact table — can
  * ride to every executor and discard non-joining fact rows AT THE SCAN,
  * so the shuffle carries only probable matches: true matches plus an
  * fpp fraction of the stream. The exact join afterwards drops the
  * false positives, so the result is IDENTICAL to the plain semi join —
  * the filter buys plan shape (shuffle volume), never correctness; the
  * same sketch-prefilter / exact-verify pattern as
  * [[graft.textanalysis.Decontaminate.contaminationHitsBloom]].
  *
  * Derivation: the reference's membership-flag join
  * (`Actualizar_Precios_de_Nexo.py` `isin`-style match marking)
  * re-expressed as the shape that survives a fact table 10^6× the
  * dimension.
  */
object BloomJoin {

  /** `fact ⋉ dim` (left semi) with a Bloom prefilter on the fact scan.
    * The dim key set aggregates to a fixed-size filter (only the bit
    * array reaches the driver), re-broadcasts, and probes via the
    * codegen'd [[graft.functions.BloomMightContain]] — the prune stays
    * inside whole-stage codegen. Keys probe as canonical strings, so
    * any key type with a stable string form works.
    *
    * EAGER BY CONSTRUCTION — unlike the rest of the DataFrame API,
    * this call runs Spark jobs on the DIM side at call time (once, not
    * per downstream action): the Bloom bit array must physically exist
    * before it can be embedded in the returned plan; Spark has no
    * lazy-broadcast hook for user filters (its own runtime row-level
    * filtering is planner-internal). With `expectedKeys` unset that is
    * two dim-side jobs (a sizing count + the filter aggregation); pass
    * the caller's cardinality estimate to skip the count — Bloom
    * sizing tolerates over-estimates (a few × more bits), and the
    * exact verify join makes any under-estimate a pure perf (never
    * correctness) concern. Cache the returned DataFrame if composing
    * it more than once. */
  def semiJoinBloom(fact: DataFrame, dim: DataFrame, factKey: String,
                    dimKey: String, fpp: Double = 0.01,
                    expectedKeys: Option[Long] = None): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    require(expectedKeys.forall(_ > 0),
      s"expectedKeys must be positive, got $expectedKeys")
    val keys = dim.select(col(dimKey).cast("string").as("__k"))
      .where(col("__k").isNotNull).distinct()
    // dim is small by contract (a filtered dimension); the sizing count
    // costs nothing next to the fact scan it saves
    val n = expectedKeys.getOrElse(math.max(keys.count(), 1L))
    val bcast = fact.sparkSession.sparkContext
      .broadcast(keys.stat.bloomFilter("__k", n, fpp))
    fact
      .filter(graft.functions.BloomMightContain(
        col(factKey).cast("string"), bcast))
      .join(dim.select(col(dimKey).as("__dk")).distinct(),
        col(factKey) === col("__dk"), "left_semi")
  }

  /** Skew-proof inner equi-join by salting: the fact side gets a
    * deterministic salt in [0, salts) hashed from `saltCols` (never
    * `rand()` — task retries and AQE re-plans must not move rows
    * between lanes), the dim side replicates `salts`× via a literal
    * explode, and the join keys on (key, salt). Row-identical to the
    * plain inner join, but a fact key holding 20% of a 100 TB corpus
    * now spreads over `salts` reducers instead of melting one task.
    * The dim-side cost is bounded: |dim|·salts rows, each a copy of an
    * already-small filtered dimension. AQE's skew-join split handles
    * sort-merge skew adaptively; the explicit salt is the declarative
    * form that also covers aggregate-after-join pipelines and engines
    * without AQE, and it makes the two-level shape plan-assertable.
    *
    * Interplay with `spark.sql.adaptive.skewJoin.enabled` (on by
    * default on a real cluster): the two COMPOSE, they never
    * double-apply. The salted shuffle hashes on (key, salt), so the
    * hot key's rows spread over `salts` reducer partitions and AQE's
    * skew detector — which fires only on a post-shuffle partition
    * exceeding its size thresholds — sees nothing to split; its
    * optimizer marks no join leg `skew=true` (pinned by the
    * "AQE finds no skew" Round10Spec case). If `salts` is chosen too
    * small for the actual skew, AQE remains armed and splits whatever
    * residual oversize survives the salt — a safety net, not a
    * conflict. */
  def skewSaltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                     dimKey: String, saltCols: Seq[String],
                     salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltCols.map(col): _*), lit(salts)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        col(factKey) === col(dimKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
