package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Compaction, HeavyHitters, Md5, TemperatureMixture}

/** Round-11 continuation gates: the heavy-hitters sketch family and
  * curation/layout planners. Each Spark query has a DuckDB oracle
  * generated from the same constants, like [[Round11]]. */
object Round11b {

  /** Heavy-hitter constants. The synthetic key plants two hot keys
    * (each ~1/6 of rows) over a ~2000-key cold tail, the shape MG is
    * for: the exact `GROUP BY` the oracle runs would shuffle the whole
    * key space; the engine shuffles k counters per task and exact-counts
    * only the ≤ k candidates. MinShare 0.05 → k = ceil(1/0.05) = 20
    * counters, auto-sized. */
  private val HhShare = 0.05

  /** Compaction fixture: ~997 synthetic files with integral byte sizes
    * (quantities are integral doubles, so the sum is exact), packed to
    * 8 MB bins. */
  private val CompactFiles = 997
  private val CompactTarget = 8000000L

  /** Temperature resampling budget over the documents corpus. */
  private val TempTotal = 300L

  val defs: Map[String, Q] = Map(

    // small-file compaction planning: greedy first-fit bin assignment
    // off an exclusive byte prefix sum (BucketedPrefixSum — two-level,
    // never a one-task sort), bin = cum_before div target; the summary
    // is what an OPTIMIZE rewrite job consumes. Interior bins land
    // within one max-file of the target by construction
    "layout_compaction" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      val stats = li.groupBy((col("l_orderkey") % CompactFiles)
          .as("file_id"))
        .agg((sum(col("l_quantity")) * 100).cast("long").as("bytes"))
      Compaction.binSummary(stats, "file_id", "bytes", CompactTarget,
          bucketWidth = 128)
        .orderBy("bin")
    }),

    // temperature-scaled mixture resampling (alpha = 0.5): quotas
    // derived from observed counts via sqrt — IEEE-exact on both
    // engines, summed in the same ascending-lang fold — then exact
    // per-lang bottom-quota by the md5 hash order. The head language
    // flattens, tails over-represent, and the exact sampled set
    // replays row-for-row in DuckDB
    "sample_temperature" -> ((s, dir) =>
      TemperatureMixture(tbl(s, dir, "documents"), "lang", TempTotal,
          Seq("doc_id"), hash = Md5)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")),

    // EXACT heavy hitters in two bounded-state passes: a mergeable
    // Misra-Gries sketch (k counters per task, map-side combined —
    // the superset guarantee means no true heavy key can be missed)
    // plus one exact count over only the surviving candidates. The
    // oracle runs the full GROUP BY ... HAVING — exactness, not
    // approximation, is what the gate verifies
    "agg_heavy_hitters" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      val key = when(col("l_orderkey") % 3 === 0,
          concat(lit("hot"), col("l_orderkey") % 2))
        .otherwise(concat(lit("cold"), col("l_partkey")))
      HeavyHitters.exact(li, key, HhShare)
        .orderBy("k")
    }),

    // per-group heavy hitters: one grouped MG pass (k counters per
    // group), exact verify over candidate (group, key) pairs only —
    // "top domains per language over 100 TB" in two scans
    "agg_heavy_hitters_grouped" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      val key = when(col("l_partkey") % 5 === 0,
          concat(lit("hot"), col("l_partkey") % 2))
        .otherwise(concat(lit("c"), col("l_partkey")))
      HeavyHitters.exactGrouped(li, col("l_returnflag"), key, HhShare)
        .orderBy("g", "k")
    }))

  val oracles: Map[String, String] = Map(

    "layout_compaction" ->
      s"""WITH f AS (
           SELECT l_orderkey % $CompactFiles AS file_id,
             (sum(l_quantity) * 100)::BIGINT AS bytes
           FROM lineitem GROUP BY 1),
         c AS (SELECT file_id, bytes,
             coalesce(sum(bytes) OVER (ORDER BY file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0)::BIGINT AS cum_before
           FROM f)
       SELECT (cum_before // $CompactTarget)::BIGINT AS bin,
         count(*)::BIGINT AS n_files, sum(bytes)::BIGINT AS total_bytes
       FROM c GROUP BY 1 ORDER BY 1""",

    "sample_temperature" ->
      s"""WITH c AS (SELECT lang, count(*)::BIGINT AS n
             FROM documents GROUP BY 1),
         w AS (SELECT lang, n, sqrt(n::DOUBLE) AS w,
             sum(sqrt(n::DOUBLE)) OVER (ORDER BY lang
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM c),
         q AS (SELECT lang,
             least(n, CAST(floor($TempTotal * w / (max(cum) OVER ()))
               AS BIGINT)) AS quota
           FROM w),
         r AS (SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
           FROM documents)
       SELECT r.lang, r.doc_id
       FROM r JOIN q USING (lang) WHERE rn <= quota
       ORDER BY lang, doc_id""",

    "agg_heavy_hitters" ->
      s"""WITH t AS (
           SELECT CASE WHEN l_orderkey % 3 = 0
                       THEN 'hot' || (l_orderkey % 2)::VARCHAR
                       ELSE 'cold' || l_partkey::VARCHAR END AS k
           FROM lineitem),
         tot AS (SELECT count(*)::BIGINT AS n FROM t)
       SELECT k, count(*)::BIGINT AS cnt,
         count(*) / n::DOUBLE AS share
       FROM t, tot GROUP BY k, n
       HAVING count(*) > n * $HhShare
       ORDER BY k""",

    "agg_heavy_hitters_grouped" ->
      s"""WITH t AS (
           SELECT l_returnflag AS g,
             CASE WHEN l_partkey % 5 = 0
                  THEN 'hot' || (l_partkey % 2)::VARCHAR
                  ELSE 'c' || l_partkey::VARCHAR END AS k
           FROM lineitem),
         tot AS (SELECT g, count(*)::BIGINT AS n FROM t GROUP BY g)
       SELECT t.g, k, count(*)::BIGINT AS cnt,
         count(*) / n::DOUBLE AS share
       FROM t JOIN tot USING (g)
       GROUP BY t.g, k, n
       HAVING count(*) > n * $HhShare
       ORDER BY g, k""")
}
