package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import graft.ingest.RawSheetReader
import graft.sources.RawSheetSource

/** The DataSource V2 rawsheet provider: row-for-row parity with
  * `RawSheetReader.readSheet` on every fixture shape (preamble,
  * aliases, duplicate columns, missing ensure targets), plus the V2
  * payoff — column pruning reaching the scan. */
class RawSheetSourceSpec extends SparkTestBase {

  private val cfg = RawSheetReader.Config(
    aliases = Seq(
      "Numero de inmueble" -> Seq("número de inmueble", "numero de inmueble",
        "unidad", "codigo"),
      "Precio de lista" -> Seq("precio de lista", "precio", "precio lista"),
      "Estado de inmueble" -> Seq("estado de inmueble", "estado",
        "estado comercial"),
      "Tipologia" -> Seq("Tipología", "tipologia")),
    ensure = Seq("Numero de inmueble", "Precio de lista", "Estado de inmueble",
      "Tipologia"))

  private lazy val dir = Files.createTempDirectory("rawsheet-v2")
  private def fixture(name: String, lines: Seq[String]): String = {
    val p = dir.resolve(name)
    Files.write(p, String.join("\n", lines: _*).getBytes("UTF-8"))
    p.toString
  }

  private def v2(path: String, proyecto: String): DataFrame =
    spark.read.format("graft.sources.RawSheetDataSource")
      .options(RawSheetSource.options(cfg, proyecto))
      .load(path)

  private def assertParity(path: String, proyecto: String): Unit = {
    val expected = RawSheetReader.readSheet(spark, path, proyecto, cfg)
    val got = v2(path, proyecto)
    assert(got.columns.toSeq === expected.columns.toSeq, "schema order")
    assert(got.exceptAll(expected).count() === 0L, "v2-only rows")
    assert(expected.exceptAll(got).count() === 0L, "rdd-only rows")
  }

  test("parity: junk preamble + accented canonical headers") {
    assertParity(fixture("matera.csv", Seq(
      "LISTA DE PRECIOS,,,",
      ",,,",
      "Número de inmueble,Precio de lista,Estado de inmueble,Tipología",
      "101.0,\"1.200.000,50\",Disponible (Visible),A-301",
      "102,\"950,000.00\",No Disponible (Vendido),B-102",
      "103,N/A,Disponible (Oculto),C-9")), "Matera")
  }

  test("parity: aliased headers, extra column, missing ensure target") {
    assertParity(fixture("capadocia.csv", Seq(
      "unidad,precio,estado,Tipología,Piso",
      "A101,\"2.000.000,00\",Disponible,A-1,1",
      "102,\"1.500.000,00\",Disponible,B-2,2")), "Capadocia")
  }

  test("parity: duplicate price column collapses first-non-null") {
    val p = fixture("fenix.csv", Seq(
      "Número de inmueble,Precio de lista,Precio de lista",
      "201,,\"500.000,00\"",
      "202,\"600.000,00\",\"999.999,99\""))
    assertParity(p, "Fenix")
    // the collapse itself: row 201 takes the second cell
    val r = v2(p, "Fenix").filter(org.apache.spark.sql.functions
      .col("Numero de inmueble") === "201").head()
    assert(r.getAs[String]("Precio de lista") === "500.000,00")
  }

  test("a Proyecto-mismatch filter skips the whole file at planning") {
    val p = fixture("skip.csv", Seq(
      "Número de inmueble,Precio de lista,Estado de inmueble,Tipología",
      "101,\"1.000,00\",Disponible,A-1"))
    val df = v2(p, "Matera")
    // match: rows flow, filter handled by the pushed literal
    assert(df.filter(org.apache.spark.sql.functions.col("Proyecto")
      === "Matera").count() === 1)
    // mismatch: zero partitions planned — the file is never opened
    val miss = df.filter(org.apache.spark.sql.functions.col("Proyecto")
      === "Otro")
    assert(miss.count() === 0)
    assert(miss.queryExecution.executedPlan.toString
      .contains("file-skipped"),
      s"mismatch must skip at the scan:\n${miss.queryExecution.executedPlan}")
  }

  test("column pruning reaches the scan") {
    val p = fixture("prune.csv", Seq(
      "Número de inmueble,Precio de lista,Estado de inmueble,Tipología",
      "101,\"1.000,00\",Disponible,A-1"))
    val pruned = v2(p, "X").select("Proyecto", "Precio de lista")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name).toSet === Set("Proyecto", "Precio de lista"),
      s"scan must emit only required columns, got ${scan.output}")
    assert(pruned.head().getString(0) === "X")
    assert(pruned.head().getString(1) === "1.000,00")
  }
}
