package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Kpi, PriceUpdate}

/** Golden-VALUE parity against the reference's committed outputs — the
  * strongest reference-parity evidence available offline.
  *
  * Fixtures (tools/xlsx_fixtures.py) convert the reference's real data:
  *  - `data_sperant_actual/BD_SPERANT_ACTUAL.xlsx` (1,961-row CRM extract)
  *  - `tablas_actualizadas/Auditoria/Detalle_cambios_Matera.xlsx` — every
  *    Matera row with its before/after values, which reconstructs the E1
  *    INPUT sheet exactly (all 189 rows appear: each had an estado change)
  *  - `tablas_actualizadas/Auditoria/Resumen_cambios_por_proyecto.xlsx`
  *  - `html_con_datos/kpis.json` (computed on the pre-update sheets)
  *
  * The spec replays E1 (PriceUpdate) and E2 (Kpi) on the reconstructed
  * input + real CRM extract and asserts the reference's own numbers:
  * resumen {189 registros, 15 cambios_precio, 189 cambios_estado},
  * per-row detalle values, and the Matera KPI node
  * {189, 505584.74, 490115.56} with por_estado {150, 20, 19}.
  */
class GoldenParitySpec extends SparkTestBase {

  private val fix = "src/test/resources/fixtures"

  private lazy val detalleGolden = spark.read.parquet(s"$fix/matera_detalle_golden.parquet")
  private lazy val updatedGolden = spark.read.parquet(s"$fix/matera_updated.parquet")
  private lazy val resumenGolden = spark.read.parquet(s"$fix/resumen_golden.parquet")
  private lazy val sperant = spark.read.parquet(s"$fix/sperant_actual.parquet")

  /** The Matera input sheet, reconstructed from the golden detail's
    * *_Antes columns (+ the real Tipología carried by the updated table).
    */
  private lazy val materaInput: DataFrame = {
    val tip = updatedGolden.select(col("_rowid").cast("long").as("_rowid"),
      col("Tipología").as("Tipologia"))
    detalleGolden
      .join(tip, Seq("_rowid"))
      .select(
        lit("Matera").as("Proyecto"),
        col("Número de inmueble").as("Numero de inmueble"),
        col("Precio de lista_Antes").cast("string").as("Precio de lista"),
        col("Estado de inmueble_Antes").as("Estado de inmueble"),
        col("Tipologia"),
        col("_rowid").as("_file_row"))
  }

  private lazy val result = PriceUpdate.run(Seq(materaInput), sperant)

  test("E1 golden: resumen row matches Resumen_cambios_por_proyecto.xlsx") {
    val mine = result.resumen.filter(col("Proyecto") === "Matera").head()
    val gold = resumenGolden.filter(col("Proyecto") === "Matera").head()
    Seq("Registros", "Con_Match", "Sin_Match", "Cambios", "Cambios_Precio",
      "Cambios_Estado", "Sin_Cambio").foreach { c =>
      assert(mine.getAs[Long](c) === gold.getAs[Long](c), c)
    }
    Seq("%_Con_Match", "%_Sin_Match", "%_Cambios", "%_Sin_Cambio").foreach { c =>
      assert(math.abs(mine.getAs[Double](c) - gold.getAs[Double](c)) < 1e-9, c)
    }
    // the headline numbers, stated explicitly
    assert(mine.getAs[Long]("Registros") === 189L)
    assert(mine.getAs[Long]("Cambios_Precio") === 15L)
    assert(mine.getAs[Long]("Cambios_Estado") === 189L)
  }

  test("E1 golden: per-row detalle matches Detalle_cambios_Matera.xlsx") {
    val mineCols = result.detalle.select(
      col("_rowid"),
      col("Numero de inmueble").as("num"),
      col("Precio de lista_Antes").as("p_antes"),
      col("Precio de lista_Despues").as("p_despues"),
      col("Estado de inmueble_Antes").as("e_antes"),
      col("Estado de inmueble_Despues").as("e_despues"),
      col("Cambio_PrecioLista").as("cp"),
      col("Cambio_Estado").as("ce"))
    val goldCols = detalleGolden.select(
      col("_rowid"),
      col("Número de inmueble").as("g_num"),
      col("_precio_num_Antes").as("g_p_antes"),
      col("Precio de lista_Despues").as("g_p_despues"),
      col("Estado de inmueble_Antes").as("g_e_antes"),
      col("Estado de inmueble_Despues").as("g_e_despues"),
      (col("Cambio_PrecioLista") === "1").as("g_cp"),
      (col("Cambio_Estado") === "1").as("g_ce"))
    val joined = mineCols.join(goldCols, Seq("_rowid"), "full").cache()
    try {
      assert(joined.count() === 189L)
      val mismatches = joined.filter(
        !(col("num") <=> col("g_num")) ||
          !(col("e_antes") <=> col("g_e_antes")) ||
          !(col("e_despues") <=> col("g_e_despues")) ||
          !(col("cp") <=> col("g_cp")) || !(col("ce") <=> col("g_ce")) ||
          abs(col("p_antes") - col("g_p_antes")) > 1e-6 ||
          abs(col("p_despues") - col("g_p_despues")) > 1e-6)
      assert(mismatches.count() === 0L,
        mismatches.collect().take(5).mkString("\n"))
    } finally joined.unpersist()
  }

  test("E2 golden: Matera KPI node matches kpis.json") {
    // the reference read .xls price cells as FLOATS (xlrd), and _safe_num
    // passes floats through — so the KPI input carries a numeric price
    val kpiIn = Kpi.withNumShadows(
      materaInput.withColumn("Precio de lista",
        col("Precio de lista").cast("double")),
      Seq("Precio de lista"))
    val byP = Kpi.byProyecto(kpiIn, "Precio de lista_num")
      .filter(col("Proyecto") === "Matera").head()
    assert(byP.getAs[Long]("unidades") === 189L)
    assert(byP.getAs[Double]("precio_promedio") === 505584.74)
    assert(byP.getAs[Double]("precio_median") === 490115.56)
    val estados = Kpi.byEstado(kpiIn, "Estado de inmueble").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estados === Map(
      "Disponible (Visible)" -> 150L,
      "Disponible (Oculto)" -> 20L,
      "No Disponible (Vendido)" -> 19L))
  }

  test("E1 golden: updated table values match Matera.xlsx (after state)") {
    // spot assertion over ALL rows: the pipeline's after-price must equal
    // the golden updated table's "Precio de lista" per unit
    val mine = result.updated.select(
      col("Numero de inmueble").as("num"),
      col("_precio_num_despues").as("p"),
      col("Estado de inmueble").as("e"))
    val gold = updatedGolden.select(
      col("Número de inmueble").as("num"),
      col("Precio de lista").cast("double").as("g_p"),
      col("Estado de inmueble").as("g_e"))
    val joined = mine.join(gold, Seq("num"), "full")
    assert(joined.count() === 189L)
    assert(joined.filter(!(col("e") <=> col("g_e"))
      || abs(col("p") - col("g_p")) > 1e-6).count() === 0L)
  }

  test("Excel-to-Excel drive: native CRM xlsx in, golden resumen, real audit xlsx out") {
    // the full circle a reference user walks: their REAL CRM workbook
    // in through the native reader (no fixture), the E1 pipeline, and
    // the audit artifact back out as a REAL three-sheet .xlsx — with
    // the reference's own committed numbers asserted at both ends
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.ingest.XlsxSheetReader
    import graft.sinks.XlsxWriter
    val wb = "/root/reference/data_sperant_actual/BD_SPERANT_ACTUAL.xlsx"
    assume(new java.io.File(wb).isFile, s"reference workbook not present: $wb")

    val grid = XlsxSheetReader.readGrid(wb)
    // header naming as the fixture converter: trim, col_i for blanks,
    // name_k dedup — so the native frame lands the fixture's schema
    val seen = scala.collection.mutable.Set[String]()
    val headers = grid.head.zipWithIndex.map { case (v, i) =>
      val base = Option(v).map(_.trim).filter(_.nonEmpty).getOrElse(s"col_$i")
      var name = base; var k = 2
      while (seen.contains(name)) { name = s"${base}_$k"; k += 1 }
      seen += name; name
    }.toSeq
    val schema = StructType(headers.map(StructField(_, StringType)) :+
      StructField("_row", LongType))
    val rows = grid.tail.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq.padTo(headers.size, null) :+ i.toLong)
    }
    val sperantNative = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema)
      .withColumn("precio_lista", col("precio_lista").cast("double"))
      .withColumn("Precio_Final", col("Precio_Final").cast("double"))

    val r2 = PriceUpdate.run(Seq(materaInput), sperantNative)
    val mine = r2.resumen.filter(col("Proyecto") === "Matera").head()
    assert(mine.getAs[Long]("Registros") === 189L)
    assert(mine.getAs[Long]("Cambios_Precio") === 15L)
    assert(mine.getAs[Long]("Cambios_Estado") === 189L)

    val out = java.nio.file.Files.createTempDirectory("e2e-xlsx")
      .resolve("Resumen_cambios_por_proyecto.xlsx").toString
    XlsxWriter.auditWorkbookXlsx(r2.resumen, r2.soloEnNexo,
      r2.soloEnSperant, out)
    val back = XlsxSheetReader.readGrid(out, Some("Resumen"))
    val hdr = back.head.toSeq
    val materaRow = back.tail
      .find(r => r(hdr.indexOf("Proyecto")) == "Matera").get
    assert(materaRow(hdr.indexOf("Registros")) === "189")
    assert(materaRow(hdr.indexOf("Cambios_Precio")) === "15")
    assert(materaRow(hdr.indexOf("Cambios_Estado")) === "189")
  }
}
