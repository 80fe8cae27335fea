package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.XlsSheetReader
import XlsFixture._

/** Native legacy `.xls` (BIFF8/CFB) ingestion: the reader and the
  * test-scope writer are two independent implementations of the public
  * format layouts, asserted to agree cell-for-cell on a workbook that
  * exercises every record family the reader handles — then the grid
  * flows through the SAME tolerant ingestion core as the CSV/xlsx
  * paths, mirroring the reference's `xlrd` entry
  * (`Actualizar_Precios_de_Nexo.py:183-230`). */
class XlsIngestSpec extends SparkTestBase {

  // one long compressed + one long UTF-16 shared string force SST
  // CONTINUE splits INSIDE character data for both encodings
  private val longA = (0 until 9000).map(i => ('a' + i % 26).toChar).mkString
  private val wideS = "Ñandú€—λ_" * 750 // €/—/λ > 0xFF: genuinely UTF-16

  private val strings = IndexedSeq(
    "nombre", "precio", "estado", "Torre", "Nota", "extra1", "extra2",
    "101", "disponible", "T1", longA,
    "102", "vendido", "T2", wideS,
    "103", "104", "FIN")
  private def si(s: String): Int = strings.indexOf(s)

  private val cells: Seq[Array[Byte]] = Seq(
    label(0, 0, "Lista de Precios — Fénix"), // wide inline LABEL
    // row 1 fully empty: dense padding must materialize it as nulls
    label(2, 1, "generado: 2024"),
    mulBlank(3, 0, 3),
    // header row (index 4): aliases the tolerant core must detect
    labelSst(4, 0, si("nombre")), labelSst(4, 1, si("precio")),
    labelSst(4, 2, si("estado")), labelSst(4, 3, si("Torre")),
    labelSst(4, 4, si("Nota")), labelSst(4, 5, si("extra1")),
    labelSst(4, 6, si("extra2")),
    // data rows
    labelSst(5, 0, si("101")), number(5, 1, 250000.0),
    labelSst(5, 2, si("disponible")), labelSst(5, 3, si("T1")),
    labelSst(5, 4, si(longA)),
    mulRk(5, 5, Seq(rkInt(10), rkFloat(2.5), rkInt100(999))),
    labelSst(6, 0, si("102")), rk(6, 1, rkInt(250000)),
    labelSst(6, 2, si("vendido")), labelSst(6, 3, si("T2")),
    labelSst(6, 4, si(wideS)), boolErr(6, 5, v = true),
    formulaNum(6, 6, 42.5),
    labelSst(7, 0, si("103")), rk(7, 1, rkInt100(123456)),
    label(7, 2, "reservado"), labelSst(7, 3, si("T1")),
    formulaStr(7, 4, "hecho"), blank(7, 5), formulaBool(7, 6, v = false),
    labelSst(8, 0, si("104")), rk(8, 1, rkFloat(1.5)),
    rk(8, 2, rkFloat100(2.5)), rk(8, 3, rkInt(-5)),
    number(8, 4, math.Pi),
    // row 9 empty; row 10 sparse — single cell widens the grid to col 7
    labelSst(10, 7, si("FIN")))

  private val expected: Seq[Array[String]] = Seq(
    Array("Lista de Precios — Fénix", null, null, null, null, null, null, null),
    Array[String](null, null, null, null, null, null, null, null),
    Array(null, "generado: 2024", null, null, null, null, null, null),
    Array[String](null, null, null, null, null, null, null, null),
    Array("nombre", "precio", "estado", "Torre", "Nota", "extra1", "extra2", null),
    Array("101", "250000", "disponible", "T1", longA, "10", "2.5", "9.99"),
    Array("102", "250000", "vendido", "T2", wideS, "1", "42.5", null),
    Array("103", "1234.56", "reservado", "T1", "hecho", null, "0", null),
    Array("104", "1.5", "0.025", "-5", "3.141592653589793", null, null, null),
    Array[String](null, null, null, null, null, null, null, null),
    Array(null, null, null, null, null, null, null, "FIN"))

  private def stream: Array[Byte] =
    workbookStream("Precios", strings, strings.length * 2, cells)

  private def writeTmp(bytes: Array[Byte]): String = {
    val p = Files.createTempFile("graft-xls", ".xls")
    Files.write(p, bytes)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def assertGrid(grid: Seq[Array[String]]): Unit = {
    assert(grid.length === expected.length,
      s"rows: got ${grid.length}, want ${expected.length}")
    expected.zipWithIndex.foreach { case (want, r) =>
      assert(grid(r).length === want.length, s"row $r width")
      want.zipWithIndex.foreach { case (w, c) =>
        assert(grid(r)(c) === w, s"cell ($r,$c)")
      }
    }
  }

  test("CFB workbook round-trips cell-for-cell through the reader") {
    val path = writeTmp(cfb(stream))
    assert(XlsSheetReader.sheetNames(path) === Seq("Precios"))
    assertGrid(XlsSheetReader.readGrid(path))
    intercept[IllegalArgumentException] {
      XlsSheetReader.readGrid(path, Some("no_such_sheet"))
    }
  }

  test("SST really split across CONTINUE records (not one giant record)") {
    // the two long strings alone exceed one 8224-byte record, so the
    // grid equality above only proves continuation handling if the
    // writer actually split — assert it did
    val sstBytes = sst(strings, strings.length * 2)
    var pos = 0
    var continues = 0
    while (pos + 4 <= sstBytes.length) {
      val id = (sstBytes(pos) & 0xFF) | ((sstBytes(pos + 1) & 0xFF) << 8)
      val sz = (sstBytes(pos + 2) & 0xFF) | ((sstBytes(pos + 3) & 0xFF) << 8)
      if (id == 0x003C) continues += 1
      pos += 4 + sz
    }
    assert(continues >= 2, s"expected >=2 CONTINUE records, got $continues")
  }

  test("bare BIFF stream (no CFB container) reads identically") {
    assertGrid(XlsSheetReader.readGrid(writeTmp(stream)))
  }

  test("mini-stream (< 4096-byte Workbook) resolves via the mini-FAT") {
    // a small workbook: no long strings, same record families
    val smallStrings = IndexedSeq("nombre", "precio", "u1")
    val smallCells: Seq[Array[Byte]] = Seq(
      labelSst(0, 0, 0), labelSst(0, 1, 1),
      labelSst(1, 0, 2), rk(1, 1, rkInt100(123456)))
    val small = workbookStream("Hoja", smallStrings, 4, smallCells)
    assert(small.length < 4096, s"fixture must stay under the cutoff")
    val path = writeTmp(cfb(small, forceMini = true))
    val grid = XlsSheetReader.readGrid(path)
    assert(grid.map(_.toSeq) === Seq(Seq("nombre", "precio"),
      Seq("u1", "1234.56")))
  }

  test("truncated workbook yields the cells before the cut (xlrd tolerance)") {
    val cut = stream.length - 150 // inside the sheet substream
    val grid = XlsSheetReader.readGrid(
      writeTmp(java.util.Arrays.copyOf(stream, cut)))
    assert(grid.length <= expected.length)
    assert(grid(5)(0) === "101", "cells before the cut must survive")
  }

  test("a legacy .xls flows through the tolerant ingestion core") {
    val path = writeTmp(cfb(stream))
    val df = XlsSheetReader.readSheet(spark, path, "Fenix", Demo.aliasCfg)
    // header auto-detected at row 4 via the 'nombre'/'precio'/'estado'
    // aliases; canonical renames + ensured Tipologia + Proyecto
    Seq("Numero de inmueble", "Precio de lista", "Estado de inmueble",
      "Tipologia", "Proyecto", "_file_row").foreach { c =>
      assert(df.columns.contains(c), s"missing canonical column $c")
    }
    assert(df.count() === 6) // rows below the header, empties included
    val r = df.orderBy("_file_row")
      .select("Numero de inmueble", "Precio de lista",
        "Estado de inmueble", "Tipologia", "Proyecto")
      .collect()
    assert(r(0).getString(0) === "101")
    assert(r(0).getString(1) === "250000")
    assert(r(0).getString(2) === "disponible")
    assert(r(0).isNullAt(3), "ensured column must be null, not invented")
    assert(r(0).getString(4) === "Fenix")
    assert(r(2).getString(1) === "1234.56")
    assert(r(3).getString(1) === "1.5")
  }
}
