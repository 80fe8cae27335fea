package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.query.ViewServer

/** E3 demo main — the reference dashboard's interactive layer driven
  * end-to-end as a runnable: load a units snapshot, stand up the
  * [[graft.query.ViewServer]] session view, then execute the exact
  * interaction sequence the browser performs (ref `index.html` /
  * `index_2.html:302-342`): filter → any-column search → locale-numeric
  * sort → paginate, plus the four chart aggregations — each chart run
  * BOTH through the parameterized method and as the equivalent ANSI SQL
  * against the registered temp view, because the dashboard's query
  * builder and an analyst's raw SQL must be the same surface.
  *
  * `sbt "runMain graft.DashboardDemo [sfDir]"` — the snapshot derives
  * from the testdata `part` table under the same column mapping the
  * A9–A12 gates use (`Round19Spec` pins the two against each other),
  * so the demo is self-contained next to the verify corpus.
  */
object DashboardDemo {

  /** The gates' dashboard-units mapping (mirrors `Round13.unitsFrom`;
    * Round19Spec pins the A9/A12 outputs of this frame against the
    * `view_count_by_estado` / `view_scatter` gates, so a drift here
    * fails the suite, not the demo). */
  def unitsFixture(s: SparkSession, dir: String): DataFrame =
    queries.tbl(s, dir, "part").select(
      col("p_brand").as("Proyecto"),
      col("p_partkey").cast("string").as("Numero de inmueble"),
      when(col("p_size") % 7 === 0, lit(null))
        .otherwise(col("p_type")).as("Estado de inmueble"),
      col("p_retailprice").as("Precio de lista_num"),
      col("p_size").cast("double").as("Area total_num"))

  /** The full interaction sequence over a standing view server:
    * (surface name, frame) in the order the dashboard renders them.
    * Chart surfaces come in method/SQL pairs with `:sql` suffixes —
    * pinned row-identical in Round19Spec. */
  def drive(vs: ViewServer, viewName: String,
            proyecto: String, estado: String, searchTerm: String,
            pageSize: Int): Seq[(String, DataFrame)] = {
    val filtered = vs.filtered(proyecto = Some(proyecto))
    val searched = vs.filtered(search = Some(searchTerm))
    val pageOrder = ViewServer.localeNumericKeys(
      col("Numero de inmueble"), "es").map(_.asc)
    Seq(
      // table surfaces: filter, search, sort+paginate (pages 1 and 2)
      "filter_proyecto" -> filtered,
      "search_any" -> searched,
      "page1" -> vs.page(vs.sortedByLocaleNumeric(
        filtered, "Numero de inmueble"), pageOrder, 1, pageSize),
      "page2" -> vs.page(vs.sortedByLocaleNumeric(
        filtered, "Numero de inmueble"), pageOrder, 2, pageSize),
      // A9 — estados of the selected project (null -> __NA__ bucket)
      "chart_estados" -> vs.countByEstado(filtered),
      "chart_estados:sql" -> vs.sql(
        s"""SELECT coalesce(`Estado de inmueble`, '__NA__') AS estado,
              count(1) AS n
            FROM $viewName WHERE `Proyecto` = ?
            GROUP BY 1 ORDER BY n DESC, estado""", proyecto),
      // A10 — average positive price per project, 0.0 when none
      "chart_avg_precio" -> vs.avgPriceByProyecto(
        vs.filtered(), "Precio de lista_num"),
      "chart_avg_precio:sql" -> vs.sql(
        s"""SELECT `Proyecto`,
              coalesce(round(avg(CASE WHEN `Precio de lista_num` > 0
                THEN `Precio de lista_num` END), 2), 0.0)
                AS precio_promedio
            FROM $viewName GROUP BY `Proyecto` ORDER BY `Proyecto`"""),
      // A12 — price-vs-area scatter of one estado
      "chart_scatter" -> vs.scatter(
          vs.filtered(estado = Some(estado)),
          "Precio de lista_num", "Area total_num")
        .orderBy("Proyecto", "x", "y"),
      "chart_scatter:sql" -> vs.sql(
        s"""SELECT `Area total_num` AS x, `Precio de lista_num` AS y,
              `Proyecto`, `Estado de inmueble` AS estado
            FROM $viewName
            WHERE `Estado de inmueble` = ?
              AND `Precio de lista_num` > 0 AND `Area total_num` > 0
            ORDER BY `Proyecto`, x, y""", estado))
  }

  /** A11 — the stacked proyecto × estado chart (count and the
    * percent-toggle variant), over the unfiltered view like the
    * reference's global stack. Separate from [[drive]] because the
    * estado column list is data-dependent (the dashboard derives it
    * from the rows in view). */
  def stackedCharts(vs: ViewServer): Seq[(String, DataFrame)] = {
    val estados = vs.filtered()
      .select(coalesce(col("Estado de inmueble"), lit("__NA__")))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    Seq(
      "chart_stack" -> vs.stackedCounts(vs.filtered(), estados),
      "chart_stack_pct" ->
        vs.stackedCounts(vs.filtered(), estados, percent = true))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vs = new ViewServer(unitsFixture(spark, sfDir), "units_demo")
    try {
      val surfaces = drive(vs, "units_demo", proyecto = "Brand#7",
        estado = "ECONOMY", searchTerm = "anodized", pageSize = 5) ++
        stackedCharts(vs)
      surfaces.foreach { case (name, df) =>
        println(s"[dashboard] $name:")
        df.show(8, truncate = false)
      }
      println(s"[dashboard] ${surfaces.size} surfaces over $sfDir")
    } finally vs.close()
    spark.stop()
  }
}
