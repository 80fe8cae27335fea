package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("pipeline_price_update")(spark, "/root/testdata/sf0.001")

  private def defMaps: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    Seq(Relational.defs, Relational2.defs, Extensions.defs, Pipelines.defs,
      Round7.defs, Analytics7.defs, Round9.defs, Round10.defs, Round11.defs,
      Round11b.defs, Round12.defs, Round12b.defs, Round12c.defs,
      Round12d.defs, Round13.defs, Round13b.defs, Round13c.defs,
      Round13d.defs, Round13e.defs, Round13f.defs, Round13g.defs,
      Round13h.defs, Round13i.defs, Round13j.defs, Round13k.defs,
      Round14.defs, Round14b.defs, Round14c.defs, Round15.defs,
      Round15b.defs, Round15c.defs, Round15d.defs, Round16.defs,
      Round16b.defs, Round16c.defs, Round16d.defs, Round16e.defs, Round16f.defs, Round16g.defs,
      Round16h.defs, Round17.defs, Round18.defs)

  private def oracleMaps: Seq[Map[String, String]] =
    Seq(Relational.oracles, Relational2.oracles, Extensions.oracles,
      Pipelines.oracles, Round7.oracles, Analytics7.oracles, Round9.oracles,
      Round10.oracles, Round11.oracles, Round11b.oracles, Round12.oracles,
      Round12b.oracles, Round12c.oracles, Round12d.oracles, Round13.oracles,
      Round13b.oracles, Round13c.oracles, Round13d.oracles, Round13e.oracles,
      Round13f.oracles, Round13g.oracles, Round13h.oracles, Round13i.oracles,
      Round13j.oracles, Round13k.oracles, Round14.oracles, Round14b.oracles,
      Round14c.oracles, Round15.oracles, Round15b.oracles, Round15c.oracles,
      Round15d.oracles, Round16.oracles, Round16b.oracles, Round16c.oracles,
      Round16d.oracles, Round16e.oracles, Round16f.oracles,
      Round16g.oracles, Round16h.oracles, Round17.oracles,
      Round18.oracles)

  /** A duplicate key across batch files would SILENTLY shadow the
    * earlier gate under `++` (found the hard way in round 16: a second
    * `scalar_currency_pen` replaced the round-11 one) — merge with an
    * explicit uniqueness check instead. */
  private def merged[V](maps: Seq[Map[String, V]], what: String)
      : Map[String, V] = {
    val all = maps.flatMap(_.keys)
    val dups = all.groupBy(identity).collect {
      case (k, vs) if vs.size > 1 => k
    }
    require(dups.isEmpty, s"duplicate $what keys across batches: $dups")
    maps.reduce(_ ++ _)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(defMaps, "queries")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = merged(oracleMaps, "oracleSql")
}
