package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tolerant raw-sheet ingestion (SURVEY.md §2.1 S1-S3, §2.2 P1-P3).
  *
  * Reproduces the reference's Excel-dump semantics on CSV/text dumps:
  * junk preamble rows, header auto-detection by alias scan over the first
  * 15 rows (fallback row index 4), whitespace/accent header cleaning,
  * duplicate-header disambiguation (`name_2` scheme), alias-to-canonical
  * renaming (first alias present wins), ensure-columns, literal project
  * injection, and a stable per-file row ordinal (`_file_row`) that later
  * stages use for `_rowid` and keep-last dedup.
  *
  * The header decision is a driver-side pre-pass over <=15 rows (cheap at
  * any scale); everything row-wise stays distributed.
  */
object RawSheetReader {

  /** Alias table: canonical name -> accepted aliases, in priority order.
    * Mirrors `Actualizar_Precios_de_Nexo.py:60-65`. */
  case class Config(
      aliases: Seq[(String, Seq[String])],
      ensure: Seq[String] = Nil,
      maxHeaderScan: Int = 15,
      fallbackHeaderRow: Int = 4)

  /** Key normalization for header matching (`_norm`, ref `:76-78`). */
  def norm(s: String): String =
    if (s == null) null else s.trim.toLowerCase

  /** Header cleaning: collapse whitespace, strip accents, name blanks,
    * disambiguate duplicates as `name_2`, `name_3` (ref `pj:40-62`). */
  def cleanHeaders(raw: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Set[String]()
    raw.map { c =>
      val base0 = Option(c).getOrElse("").replaceAll("\\s+", " ").trim
      val base1 = base0.map {
        case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
        case 'ó' => 'o'; case 'ú' => 'u'
        case 'Á' => 'A'; case 'É' => 'E'; case 'Í' => 'I'
        case 'Ó' => 'O'; case 'Ú' => 'U'
        case ch => ch
      }
      val base = if (base1.isEmpty) "col_sin_nombre" else base1
      var name = base
      var k = 2
      while (seen.contains(name)) { name = s"${base}_$k"; k += 1 }
      seen += name
      name
    }
  }

  /** Minimal quote-aware CSV line split (the raw dumps are simple). */
  def splitCsvLine(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (ch == '"') {
        if (inQuotes && i + 1 < line.length && line.charAt(i + 1) == '"') {
          sb.append('"'); i += 1
        } else inQuotes = !inQuotes
      } else if (ch == ',' && !inQuotes) {
        out += sb.toString; sb.clear()
      } else sb.append(ch)
      i += 1
    }
    out += sb.toString
    out.toArray
  }

  /** Read one raw sheet dump into a canonical string-typed DataFrame. */
  def readSheet(spark: SparkSession, path: String, proyecto: String,
                cfg: Config): DataFrame = {
    // stable line ordinal: zipWithIndex follows file order
    val lines = spark.sparkContext.textFile(path).zipWithIndex()
      .map { case (l, i) => (i, splitCsvLine(l)) }
    fromCells(spark, lines, path, proyecto, cfg)
  }

  /** The tolerant-ingestion core over any (ordinal, cells) source —
    * shared by the CSV-dump path above and [[XlsxSheetReader]]'s
    * workbook grid: header auto-detect, cleaning, alias renames,
    * duplicate collapse, ensure-columns, project injection. */
  def fromCells(spark: SparkSession,
                lines: org.apache.spark.rdd.RDD[(Long, Array[String])],
                path: String, proyecto: String, cfg: Config): DataFrame = {
    // S2 — driver-side header scan over the first maxHeaderScan rows
    val head = lines.filter(_._1 < cfg.maxHeaderScan).collect().sortBy(_._1)
    val candidates = cfg.aliases.flatMap { case (canon, al) => canon +: al }
      .map(norm).toSet
    val hdrIdx: Long = head
      .find { case (_, cells) => cells.exists(c => candidates.contains(norm(c))) }
      .map(_._1)
      .getOrElse(cfg.fallbackHeaderRow.toLong)
    val headerRaw = head.find(_._1 == hdrIdx)
      .map(_._2.toSeq)
      .getOrElse(throw new IllegalArgumentException(
        s"$path: header row $hdrIdx not found in first ${cfg.maxHeaderScan} rows"))
    val headers = cleanHeaders(headerRaw)
    val ncols = headers.length

    // project data rows onto the discovered schema (pad/truncate = PERMISSIVE)
    val rows = lines.filter(_._1 > hdrIdx).map { case (i, cells) =>
      val padded = cells.map(c => if (c == null || c.isEmpty) null else c)
        .padTo(ncols, null).take(ncols)
      Row.fromSeq(i +: padded.toSeq)
    }
    val schema = StructType(StructField("_file_row", LongType, nullable = false) +:
      headers.map(h => StructField(h, StringType, nullable = true)))
    var df = spark.createDataFrame(rows, schema)

    // P1 — alias -> canonical rename (first alias present wins)
    cfg.aliases.foreach { case (canon, aliases) =>
      if (!df.columns.contains(canon)) {
        aliases.find(a => df.columns.contains(a))
          .foreach(a => df = df.withColumnRenamed(a, canon))
      }
    }
    // F12 — collapse duplicate canonical columns (first non-null wins)
    df = collapseDuplicates(df)
    // P2 — ensure target columns exist
    cfg.ensure.foreach { c =>
      if (!df.columns.contains(c)) df = df.withColumn(c, lit(null).cast(StringType))
    }
    // P3 — literal project injection
    df.withColumn("Proyecto", lit(proyecto))
  }

  /** Collapse `name`, `name_2`, ... groups into one column via row-wise
    * first-non-null (the reference's bfill-axis-1, ref `:149-179`). */
  def collapseDuplicates(df: DataFrame): DataFrame = {
    val dupPattern = "^(.*)_(\\d+)$".r
    val bases = df.columns.toSeq
    val groups = bases.flatMap {
      case dupPattern(base, _) if bases.contains(base) => Some(base)
      case _ => None
    }.distinct
    groups.foldLeft(df) { (d, base) =>
      val members = base +: d.columns.filter(c => c.startsWith(base + "_")
        && c.stripPrefix(base + "_").forall(_.isDigit)).sorted.toSeq
      val collapsed = coalesce(members.map(col): _*)
      members.tail.foldLeft(d.withColumn(base, collapsed))((dd, m) => dd.drop(m))
    }
  }
}
