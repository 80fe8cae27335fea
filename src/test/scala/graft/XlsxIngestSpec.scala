package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.ingest.{RawSheetReader, XlsxSheetReader}

/** Native `.xlsx` ingestion against the reference repo's REAL workbook
  * (`data_sperant_actual/BD_SPERANT_ACTUAL.xlsx`, the 1,961-row CRM
  * extract): cell-for-cell parity with the fixture parquet produced by
  * the INDEPENDENT python converter (tools/xlsx_fixtures.py) — two
  * implementations of the OPC/SpreadsheetML format agreeing on every
  * cell — plus the flow into the tolerant-ingestion core. */
class XlsxIngestSpec extends SparkTestBase {

  private val wb = "/root/reference/data_sperant_actual/BD_SPERANT_ACTUAL.xlsx"
  private val fixPath = "src/test/resources/fixtures/sperant_actual.parquet"

  private def available: Boolean = new java.io.File(wb).isFile

  /** tools/xlsx_fixtures.py's header naming (trim, col_i for blanks,
    * name_k dedup) — replicated here so the grid compares against the
    * fixture's column names without touching the converter. */
  private def toolHeaders(row0: Array[String]): Seq[String] = {
    val seen = scala.collection.mutable.Set[String]()
    row0.zipWithIndex.map { case (v, i) =>
      val base = Option(v).map(_.trim).filter(_.nonEmpty)
        .getOrElse(s"col_$i")
      var name = base
      var k = 2
      while (seen.contains(name)) { name = s"${base}_$k"; k += 1 }
      seen += name
      name
    }.toSeq
  }

  test("sheet names resolve via workbook.xml, not zip order") {
    assume(available, s"reference workbook not present: $wb")
    val names = XlsxSheetReader.sheetNames(wb)
    assert(names.nonEmpty, "workbook must list at least one sheet")
    intercept[IllegalArgumentException] {
      XlsxSheetReader.readGrid(wb, Some("no_such_sheet"))
    }
  }

  test("native grid matches the independent python conversion cell-for-cell") {
    assume(available, s"reference workbook not present: $wb")
    val grid = XlsxSheetReader.readGrid(wb)
    val fix = spark.read.parquet(fixPath)
    val headers = toolHeaders(grid.head)
    assert(headers === fix.columns.filterNot(_ == "_row").toSeq,
      "header row must reproduce the fixture's column names")
    val fixRows = fix.orderBy("_row").collect()
    assert(grid.length - 1 === fixRows.length,
      s"row count: native ${grid.length - 1} vs fixture ${fixRows.length}")
    val doubleCols = Set("precio_lista", "Precio_Final")
    var cells = 0
    headers.zipWithIndex.foreach { case (h, j) =>
      fixRows.zipWithIndex.foreach { case (fr, r) =>
        val mine = grid(r + 1)(j)
        if (doubleCols(h)) {
          val g = if (fr.isNullAt(fr.fieldIndex(h))) null
            else java.lang.Double.valueOf(fr.getAs[Double](h))
          val m = Option(mine).filter(_.nonEmpty)
            .map(s => java.lang.Double.valueOf(s.toDouble)).orNull
          assert(m === g, s"row $r col $h: native $mine vs fixture $g")
        } else {
          val g = fr.getAs[String](h)
          assert(mine === g, s"row $r col $h: native $mine vs fixture $g")
        }
        cells += 1
      }
    }
    assert(cells === fixRows.length * headers.length)
  }

  test("a real workbook flows through the tolerant ingestion core") {
    assume(available, s"reference workbook not present: $wb")
    val df = XlsxSheetReader.readSheet(spark, wb, "CRM", Demo.aliasCfg)
    assert(df.count() === 1961)
    // header row 0 carries the 'nombre'/'estado comercial' aliases, so
    // auto-detect + alias rename must land the canonical columns
    Seq("Numero de inmueble", "Precio de lista", "Estado de inmueble",
      "Proyecto", "_file_row").foreach { c =>
      assert(df.columns.contains(c), s"missing canonical column $c")
    }
    assert(df.schema("Numero de inmueble").dataType === StringType)
    assert(df.filter(col("Proyecto") =!= "CRM").count() === 0)
    // the 'nombre' alias renames to the canonical unit column; the
    // CRM extract's underscore headers (precio_lista) stay verbatim
    // and the missing canonical price/estado columns were ENSURED null
    val r0 = df.orderBy("_file_row").select("Numero de inmueble",
      "precio_lista", "estado_comercial", "Precio de lista").head()
    assert(r0.getString(0) === "101")
    assert(r0.getString(1).toDouble === 547000.0)
    assert(r0.getString(2) === "no disponible")
    assert(r0.isNullAt(3), "ensured column must be null, not invented")
  }
}
