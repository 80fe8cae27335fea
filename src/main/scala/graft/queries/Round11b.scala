package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

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

  val defs: Map[String, Q] = Map(

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
