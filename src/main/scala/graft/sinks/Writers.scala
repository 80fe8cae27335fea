package graft.sinks

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2.1 S5-S11), re-expressed on Spark's writer API.
  * Excel itself is out of scope offline; the *partitioning semantics* —
  * one output group per project, ordered columns, changed-rows-only
  * detail — are what carry over, as parquet/CSV/JSON directory sinks.
  */
object Writers {

  /** F7 — filename sanitization (ref `:101-102`): keep
    * `[A-Za-z0-9._ \-()]`, fall back to "Proyecto" when nothing survives. */
  def safeFilename(name: String): String = {
    val cleaned = Option(name).getOrElse("")
      .replaceAll("[^A-Za-z0-9._ \\-()]", "").trim
    if (cleaned.isEmpty) "Proyecto" else cleaned
  }

  /** S5 — per-project sink: `partitionBy` gives one directory per project
    * (the distributed analogue of one workbook per project), with the key
    * columns ordered first (ref `:399-406`).
    */
  def perProject(df: DataFrame, keyCols: Seq[String], outDir: String): Unit = {
    val ordered = keyCols.filter(df.columns.contains) ++
      df.columns.filterNot(keyCols.contains)
    df.select(ordered.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("Proyecto")
      .parquet(outDir)
  }

  /** S7 — changed-rows-only per-project detail sink (ref `:491-497`). */
  def changedDetail(detalle: DataFrame, outDir: String): Unit =
    detalle.filter(col("Cambio_PrecioLista") || col("Cambio_Estado"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("Proyecto")
      .parquet(outDir)

  /** S6 — audit "workbook": one directory per sheet (ref `:482-487`). */
  def auditWorkbook(resumen: DataFrame, soloNexo: DataFrame,
                    soloSperant: DataFrame, outDir: String): Unit = {
    resumen.write.mode(SaveMode.Overwrite).parquet(s"$outDir/resumen")
    soloNexo.write.mode(SaveMode.Overwrite).parquet(s"$outDir/solo_en_df_total")
    soloSperant.write.mode(SaveMode.Overwrite).parquet(s"$outDir/solo_en_sperant")
  }

  /** S8 — JSON records dump: nulls for missing, one object per line
    * (ref `pj:192-205`; Spark emits null natively, no NaN scrub needed
    * under the parse-failures-are-NULL discipline).
    */
  def recordsJson(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(outDir)

  /** S9 — single nested KPI JSON document (tiny; driver-side assembly is
    * the idiomatic shape for a one-document aggregate sink). */
  def kpisJson(json: String, path: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), json)
  }

  /** S10 — quoted CSV export with header (ref `ix:108-118`). */
  def csvExport(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("quoteAll", "true")
      .csv(outDir)

  /** S11 — JSON source (dashboard boot, ref `ix:133-143`). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
