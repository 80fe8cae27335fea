package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.RawSheetReader
import graft.ingest.RawSheetReader.Config

/** DataSource V2 form of the tolerant raw-sheet ingest — the SOURCE tier
  * of the engine's Catalyst extension ladder (expression → optimizer
  * rule → physical operator → data source). Same semantics as
  * [[graft.ingest.RawSheetReader.readSheet]], spec-pinned row-for-row,
  * but packaged as a `TableProvider` so sheets read like any table:
  *
  * {{{
  * spark.read.format("graft.sources.RawSheetDataSource")
  *   .options(RawSheetSource.options(cfg, proyecto = "Matera"))
  *   .load(path)
  * }}}
  *
  * What the V2 packaging buys over the RDD helper:
  *
  *  - COLUMN PRUNING reaches the reader ([[SupportsPushDownRequiredColumns]]):
  *    a `select("Proyecto", "Precio de lista")` builds only those cells
  *    per line — the header resolution (alias → canonical rename and
  *    duplicate-column coalesce groups) is compiled once, driver-side,
  *    into per-output-column raw-cell index lists, so pruned columns
  *    cost nothing per row (the RDD path materializes every column and
  *    prunes after).
  *  - The header decision (≤ `maxHeaderScan` lines) happens in
  *    `inferSchema`, once, on the driver — exactly the pre-pass
  *    `readSheet` does, now cached in the table's schema.
  *
  * One [[InputPartition]] PER FILE: the `_file_row` ordinal is the
  * file's physical line order, which a mid-file split cannot know
  * without a scan anyway. Sheets are per-project exports — small files,
  * many of them — so parallelism comes from reading files in parallel,
  * not splitting one; at 100 TB this source is the INGEST edge, feeding
  * the parquet tables everything downstream scans.
  */
object RawSheetSource {
  // non-printing separators no real-world header contains: group sep
  // between alias groups / list entries, unit sep within a group
  private val GS = "\u001e"
  private val US = "\u001f"

  /** Encode a [[Config]] + proyecto into DSv2 string options. */
  def options(cfg: Config, proyecto: String): Map[String, String] = Map(
    "proyecto" -> proyecto,
    "aliases" -> cfg.aliases.map { case (canon, al) =>
      (canon +: al).mkString(US)
    }.mkString(GS),
    "ensure" -> cfg.ensure.mkString(US),
    "maxHeaderScan" -> cfg.maxHeaderScan.toString,
    "fallbackHeaderRow" -> cfg.fallbackHeaderRow.toString)

  private[sources] def decodeConfig(o: CaseInsensitiveStringMap): Config = {
    def split(s: String, sep: String): Seq[String] =
      if (s == null || s.isEmpty) Nil else s.split(sep, -1).toSeq
    Config(
      aliases = split(o.get("aliases"), GS).map { g =>
        val names = g.split(US, -1).toSeq
        names.head -> names.tail
      },
      ensure = split(o.get("ensure"), US),
      maxHeaderScan = o.getInt("maxHeaderScan", 15),
      fallbackHeaderRow = o.getInt("fallbackHeaderRow", 4))
  }

  /** One output column: the raw cell indices coalesced first-non-null
    * (empty = ensure-injected, always null). */
  private[sources] case class OutCol(name: String, cells: Seq[Int])

  /** The driver-side header resolution, compiled to a projection: reads
    * ≤ maxHeaderScan lines, detects the header row (alias scan,
    * fallback), cleans names, applies alias→canonical renames and
    * duplicate-group collapse — the same decisions `readSheet` makes
    * through DataFrame ops, expressed as per-column cell index lists. */
  private[sources] def resolve(path: String,
                               cfg: Config): (Long, Seq[OutCol]) = {
    val fs = new HPath(path).getFileSystem(new Configuration())
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(new HPath(path)), java.nio.charset.StandardCharsets.UTF_8))
    val head = try Iterator.continually(in.readLine()).takeWhile(_ != null)
      .take(cfg.maxHeaderScan).toVector
    finally in.close()
    val cells = head.map(RawSheetReader.splitCsvLine)
    val candidates = cfg.aliases.flatMap { case (c, al) => c +: al }
      .map(RawSheetReader.norm).toSet
    val hdrIdx = cells.indexWhere(
      _.exists(c => candidates.contains(RawSheetReader.norm(c))))
    val idx = if (hdrIdx >= 0) hdrIdx else cfg.fallbackHeaderRow
    require(idx < cells.length,
      s"$path: header row $idx not found in first ${cfg.maxHeaderScan} rows")

    var names = RawSheetReader.cleanHeaders(cells(idx).toSeq)
    // alias -> canonical: first alias present wins, only if canon absent
    cfg.aliases.foreach { case (canon, aliases) =>
      if (!names.contains(canon))
        aliases.find(names.contains).foreach { a =>
          names = names.map(n => if (n == a) canon else n)
        }
    }
    // duplicate-group collapse: base + base_N coalesce at base's slot,
    // members ordered (base, then _N suffixes string-sorted) exactly as
    // RawSheetReader.collapseDuplicates
    val dupPattern = "^(.*)_(\\d+)$".r
    val collapsedBases = names.flatMap {
      case dupPattern(b, _) if names.contains(b) => Some(b)
      case _ => None
    }.distinct.toSet
    def membersOf(base: String): Seq[Int] = {
      val withNames = names.zipWithIndex
      val extras = withNames.filter { case (n, _) =>
        n.startsWith(base + "_") && n.stripPrefix(base + "_").forall(_.isDigit)
      }.sortBy(_._1)
      (withNames.find(_._1 == base).toSeq ++ extras).map(_._2)
    }
    val dropped = collapsedBases.flatMap(b => membersOf(b).tail).toSet
    val resolved = names.zipWithIndex.flatMap {
      case (n, i) if dropped.contains(i) => None
      case (n, i) if collapsedBases.contains(n) => Some(OutCol(n, membersOf(n)))
      case (n, i) => Some(OutCol(n, Seq(i)))
    }
    val withEnsure = resolved ++ cfg.ensure
      .filterNot(e => resolved.exists(_.name == e))
      .map(e => OutCol(e, Nil))
    (idx.toLong, withEnsure)
  }
}

/** The `TableProvider` entry point (use via
  * `.format("graft.sources.RawSheetDataSource")`). */
class RawSheetDataSource extends TableProvider {
  import RawSheetSource._

  private def pathOf(o: CaseInsensitiveStringMap): String = {
    val p = o.get("path")
    require(p != null && p.nonEmpty, "rawsheet source requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (_, cols) = resolve(pathOf(options), decodeConfig(options))
    // Reserved names: the provider itself emits `_file_row` and the
    // per-file `Proyecto` literal. A sheet whose resolved headers (or
    // ensure list) already carry one of these would otherwise produce a
    // schema with duplicate field names, and the per-row projection in
    // planInputPartitions would bind the literal for both. Dropping the
    // sheet's own column mirrors `RawSheetReader.readSheet`, whose
    // `withColumn("Proyecto", lit(...))` replaces any existing column.
    val reserved = Set("_file_row", "Proyecto")
    StructType(
      StructField("_file_row", LongType, nullable = false) +:
        cols.filterNot(c => reserved(c.name))
          .map(c => StructField(c.name, StringType)) :+
        StructField("Proyecto", StringType))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val o = new CaseInsensitiveStringMap(properties)
    new RawSheetTable(pathOf(o), decodeConfig(o),
      Option(o.get("proyecto")).getOrElse(""), schema)
  }
}

private[sources] class RawSheetTable(path: String, cfg: Config,
                                     proyecto: String, tschema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"rawsheet($path)"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RawSheetScanBuilder(path, cfg, proyecto, tschema)
}

private[sources] class RawSheetScanBuilder(path: String, cfg: Config,
                                           proyecto: String,
                                           full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = full
  private var skipFile = false
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** The one filter a sheet file can answer WITHOUT reading a row:
    * equality on the per-file `Proyecto` literal. A mismatch skips the
    * whole file (zero input partitions) — the multi-sheet union then
    * reads only the requested project's files, the same file-skipping
    * a partitioned parquet store gets from its directory layout. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources.EqualTo
    val (accepted, rest) = filters.partition {
      case EqualTo("Proyecto", v) => v != null
      case _ => false
    }
    accepted.foreach { case EqualTo(_, v) =>
      if (v.asInstanceOf[String] != proyecto) skipFile = true
    }
    pushed = accepted
    rest // everything else evaluates post-scan
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed

  override def build(): Scan =
    new RawSheetScan(path, cfg, proyecto, required, skipFile)
}

private[sources] class RawSheetScan(path: String, cfg: Config,
                                    proyecto: String, required: StructType,
                                    skipFile: Boolean = false)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"rawsheet($path)${if (skipFile) " [file-skipped: Proyecto mismatch]" else ""}"
  override def planInputPartitions(): Array[InputPartition] = {
    if (skipFile) return Array.empty
    val (hdrIdx, cols) = RawSheetSource.resolve(path, cfg)
    // the projection each task builds: only REQUIRED fields, compiled
    // to cell-index lists (this is where pruning pays per row)
    val fields: Array[RawSheetPartition.Field] = required.fields.map { f =>
      f.name match {
        case "_file_row" => RawSheetPartition.RowOrdinal
        case "Proyecto" => RawSheetPartition.Literal(proyecto)
        case n => RawSheetPartition.Cells(
          cols.find(_.name == n).map(_.cells.toArray).getOrElse(Array.empty))
      }
    }
    Array(RawSheetPartition(path, hdrIdx, fields))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    RawSheetReaderFactory
}

private[sources] object RawSheetPartition {
  sealed trait Field extends Serializable
  case object RowOrdinal extends Field
  case class Literal(v: String) extends Field
  case class Cells(idx: Array[Int]) extends Field
}

private[sources] case class RawSheetPartition(
    path: String, headerIdx: Long,
    fields: Array[RawSheetPartition.Field]) extends InputPartition

private[sources] object RawSheetReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RawSheetPartitionReader(p.asInstanceOf[RawSheetPartition])
}

/** Streams one sheet file: skips to past the header line, splits each
  * line quote-aware, and materializes ONLY the required fields —
  * first-non-null over each output column's cell indices. */
private[sources] class RawSheetPartitionReader(p: RawSheetPartition)
    extends PartitionReader[InternalRow] {
  import RawSheetPartition._

  private val in = {
    val fs = new HPath(p.path).getFileSystem(new Configuration())
    new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(new HPath(p.path)), java.nio.charset.StandardCharsets.UTF_8))
  }
  private var lineNo = -1L
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = in.readLine()
    lineNo += 1
    while (line != null && lineNo <= p.headerIdx) {
      line = in.readLine()
      lineNo += 1
    }
    if (line == null) return false
    val cells = RawSheetReader.splitCsvLine(line)
    def cell(i: Int): String =
      if (i < cells.length && cells(i) != null && cells(i).nonEmpty) cells(i)
      else null
    val vals = new Array[Any](p.fields.length)
    var f = 0
    while (f < p.fields.length) {
      vals(f) = p.fields(f) match {
        case RowOrdinal => lineNo
        case Literal(v) => UTF8String.fromString(v)
        case Cells(idx) =>
          var j = 0
          var out: UTF8String = null
          while (j < idx.length && out == null) {
            val c = cell(idx(j))
            if (c != null) out = UTF8String.fromString(c)
            j += 1
          }
          out
      }
      f += 1
    }
    row = new GenericInternalRow(vals)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
