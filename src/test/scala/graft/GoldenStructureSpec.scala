package graft

import graft.pipeline.Kpi
import graft.sinks.Writers

/** Structural golden check: our KPI document has exactly the reference
  * golden's shape (`/root/reference/html_con_datos/kpis.json`). Values
  * can't be reproduced offline (the .xls inputs aren't readable here),
  * but the document tree — key names, nesting, numeric kinds — is
  * comparable via Spark's own JSON schema inference.
  */
class GoldenStructureSpec extends SparkTestBase {
  import spark.implicits._

  test("Kpi.toJson matches the reference golden document structure") {
    val goldenPath = "/root/reference/html_con_datos/kpis.json"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(goldenPath)))
    val golden = String.join("",
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(goldenPath)))

    val df = Seq(
      ("Alicanto", 415756.16, "Disponible (Visible)"),
      ("Alicanto", 440558.95, "No Disponible (Vendido)"),
      ("Capadocia", 558372.0, "Disponible (Oculto)")
    ).toDF("Proyecto", "Precio de lista_num", "Estado de inmueble")
    val ours = Kpi.toJson(df, "Precio de lista_num", "Estado de inmueble",
      "2026-08-12T00:00:00")

    def topSchema(j: String) =
      spark.read.json(Seq(j).toDS()).schema.fields
        .map(f => f.name -> f.dataType.typeName).toMap
    val g = topSchema(golden)
    val o = topSchema(ours)
    assert(o.keySet === g.keySet) // generated_at, cards, by_proyecto, by_estado
    assert(o("cards") === "struct" && o("by_proyecto") === "struct")

    // cards subtree: same three fields
    def cardFields(j: String) =
      spark.read.json(Seq(j).toDS()).select("cards.*").schema.fieldNames.toSet
    assert(cardFields(ours) === cardFields(golden))

    // per-project subtree carries the same four keys as the golden
    val goldenProj = spark.read.json(Seq(golden).toDS())
      .select("by_proyecto.Alicanto.*").schema.fieldNames.toSet
    val oursProj = spark.read.json(Seq(ours).toDS())
      .select("by_proyecto.Alicanto.*").schema.fieldNames.toSet
    assert(oursProj === goldenProj)
  }

  test("F7 filename sanitization matches the reference regex") {
    assert(Writers.safeFilename("Tizón y Bueno") === "Tizn y Bueno")
    assert(Writers.safeFilename("a/b\\c:d") === "abcd")
    assert(Writers.safeFilename("  ") === "Proyecto")
    assert(Writers.safeFilename("ok-1.2 (x)") === "ok-1.2 (x)")
  }

  test("O4b locale-collated sort orders accented names es-style") {
    val df = Seq("Ñandú", "Nexo", "Modena", "ánimo", "Alicanto").toDF("name")
    val vs = new graft.query.ViewServer(df, "collate_test")
    try {
      val sorted = vs.sortedByLocale(vs.view, "name", "es")
        .collect().map(_.getString(0))
      // es collation: accents fold for ordering, ñ sorts after n
      assert(sorted.head === "Alicanto")
      assert(sorted.indexOf("ánimo") === 1) // binary sort would put it last
      assert(sorted.indexOf("Ñandú") > sorted.indexOf("Nexo"))
    } finally vs.close()
  }

  test("O4c numeric-aware locale sort: A2 before A10 (localeCompare numeric)") {
    val df = Seq("A10", "A2", "B1", "A101", "ñ1", "n2", "T10A", "T2B")
      .toDF("unit")
    val vs = new graft.query.ViewServer(df, "natsort_test")
    try {
      val sorted = vs.sortedByLocaleNumeric(vs.view, "unit", "es")
        .collect().map(_.getString(0))
      // suffix text after the digit run must not outrank the number:
      // T2B < T10A, exactly as localeCompare(..., {numeric: true})
      assert(sorted.toSeq ===
        Seq("A2", "A10", "A101", "B1", "n2", "ñ1", "T2B", "T10A"))
    } finally vs.close()
  }
}
