package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.operators._

/** E1 pipeline mapped onto the TPC-H tables so the full flow (dedup-latest
  * -> broadcast left join -> update rule -> tolerant audit -> resumen) is
  * exercised under the DuckDB oracle: `part` plays the price list, the
  * latest `lineitem` per part plays the CRM extract.
  */
object Pipelines {

  private def updatedParts(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val nexo = tbl(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
    val crm = tbl(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"), col("l_shipdate"),
        col("l_orderkey"), col("l_linenumber"))
    val latest = DedupLatest(crm, Seq("l_partkey"),
      Seq(col("l_shipdate").desc, col("l_orderkey").desc,
        col("l_linenumber").desc))
    nexo.join(broadcast(latest), col("p_partkey") === col("l_partkey"), "left")
      .withColumn("price_after",
        UpdateRules.applyUpdate(col("p_retailprice"), col("l_extendedprice")))
      .withColumn("tiene_match", col("l_partkey").isNotNull)
      .withColumn("price_changed",
        coalesce(!isClose(col("p_retailprice"), col("price_after")), lit(false)))
  }

  val defs: Map[String, Q] = Map(
    // row-level: update + match/change flags
    "pipeline_price_update" -> ((s, dir) =>
      updatedParts(s, dir).select(
        col("p_partkey"), col("p_brand"),
        col("p_retailprice").as("price_before"),
        col("price_after"), col("tiene_match"), col("price_changed"))
        .orderBy("p_partkey")),

    // audit resumen per brand (A1/A2 shape: counts + ratio columns)
    "pipeline_resumen" -> ((s, dir) => {
      def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
      updatedParts(s, dir).groupBy("p_brand").agg(
        count(lit(1)).as("Registros"),
        cnt(col("tiene_match")).as("Con_Match"),
        cnt(!col("tiene_match")).as("Sin_Match"),
        cnt(col("price_changed")).as("Cambios"),
        cnt(!col("price_changed") && col("tiene_match")).as("Sin_Cambio"))
        .withColumn("%_Con_Match", round(col("Con_Match") / col("Registros"), 4))
        .withColumn("%_Cambios", round(col("Cambios") / col("Registros"), 4))
        .orderBy("p_brand")
    })
  )

  private val latestCte =
    """WITH latest AS (
         SELECT l_partkey, l_extendedprice FROM (
           SELECT l_partkey, l_extendedprice, row_number() OVER (
             PARTITION BY l_partkey
             ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
           FROM lineitem) WHERE rn = 1),
       u AS (
         SELECT p_partkey, p_brand, p_retailprice AS price_before,
           coalesce(l_extendedprice, p_retailprice) AS price_after,
           l_partkey IS NOT NULL AS tiene_match,
           NOT (abs(p_retailprice - coalesce(l_extendedprice, p_retailprice))
                <= 1e-8 + 1e-5 * abs(coalesce(l_extendedprice, p_retailprice)))
             AS price_changed
         FROM part LEFT JOIN latest ON p_partkey = l_partkey)"""

  val oracles: Map[String, String] = Map(
    "pipeline_price_update" -> (latestCte +
      """ SELECT p_partkey, p_brand, price_before, price_after, tiene_match,
          price_changed FROM u ORDER BY p_partkey"""),
    "pipeline_resumen" -> (latestCte +
      """ SELECT p_brand, count(*) AS "Registros",
          sum(CASE WHEN tiene_match THEN 1 ELSE 0 END)::BIGINT AS "Con_Match",
          sum(CASE WHEN NOT tiene_match THEN 1 ELSE 0 END)::BIGINT AS "Sin_Match",
          sum(CASE WHEN price_changed THEN 1 ELSE 0 END)::BIGINT AS "Cambios",
          sum(CASE WHEN NOT price_changed AND tiene_match THEN 1 ELSE 0 END)::BIGINT
            AS "Sin_Cambio",
          round(sum(CASE WHEN tiene_match THEN 1 ELSE 0 END)
            / count(*)::DOUBLE, 4) AS "%_Con_Match",
          round(sum(CASE WHEN price_changed THEN 1 ELSE 0 END)
            / count(*)::DOUBLE, 4) AS "%_Cambios"
          FROM u GROUP BY p_brand ORDER BY p_brand""")
  )
}
