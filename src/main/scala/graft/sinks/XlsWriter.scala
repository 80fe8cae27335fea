package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row}
import scala.collection.mutable.ArrayBuffer

/** Native legacy `.xls` (BIFF8 in a CFB container) workbook EMISSION —
  * the write edge whose read edge is [[graft.ingest.XlsSheetReader]],
  * closing the LAST workbook-container loop: the reference's inputs
  * are "`.xls` antiguos" read via `xlrd.open_workbook(...,
  * ignore_workbook_corruption=True)`
  * (`Actualizar_Precios_de_Nexo.py:191-193`), and round 14 gated only
  * the OOXML (`.xlsx`) sibling end-to-end; the BIFF8 reader was pinned
  * by a test-scope fixture writer alone. This sink is implemented
  * straight from the public MS-CFB / MS-XLS layouts, independently of
  * the reader's parsing code, so a write→read-back gate is two
  * implementations of the format agreeing on real bytes.
  *
  * Cell mapping (header row 0 = column names, `index=False` semantics,
  * aligned with [[XlsxWriter]] so both containers round-trip the same
  * downstream strings):
  *
  *  - integral numerics that fit the RK record's signed 30-bit payload
  *    write `RK` integer cells; wider integrals and non-RK-exact
  *    floating values write IEEE `NUMBER` cells; doubles whose low 34
  *    mantissa bits are zero write `RK` float cells (the encodings
  *    `xlrd` decodes back to the identical double);
  *  - booleans write `BOOLERR` value cells (read back as `1`/`0`);
  *  - strings (and anything else, dates included) write `LABELSST`
  *    cells against one workbook-shared `SST`, split across `CONTINUE`
  *    records — re-stating the encoding flag byte per fragment — when
  *    the string table outgrows a record's 8224-byte data cap;
  *    compressed (latin-ish) and UTF-16 encodings chosen per string;
  *  - NULL cells are simply omitted — the reader's dense grid pads
  *    missing cells with nulls, so absence IS the null encoding.
  *
  * Determinism: the record stream is a pure function of the data (SST
  * indices in first-appearance order, no timestamps), so identical
  * input yields byte-identical workbooks — same diffable-artifact
  * property as [[XlsxWriter]].
  *
  * Scale posture: a workbook is a DRIVER-SIDE presentation artifact by
  * construction — one stream, no splittable row boundaries, and BIFF8's
  * own hard 65,536-row × 256-column sheet ceiling (16-bit row ids) —
  * exactly like the files the reference consumes. Rows stream through
  * `toLocalIterator` (one partition in driver memory at a time), the
  * row cap is enforced while streaming, and the whole workbook is
  * bounded above by the format itself. Bulk data belongs to the
  * parquet/CSV sinks; this closes workbook EMISSION for the legacy
  * container.
  */
object XlsWriter {

  /** BIFF8's hard per-sheet capacity: 65,536 rows (header included). */
  val Biff8MaxRows = 65536
  /** BIFF8's hard column capacity. */
  val Biff8MaxCols = 256
  /** Max record DATA bytes before a CONTINUE split (MS-XLS). */
  private val RecCap = 8224

  // ------------------------------------------------------ byte plumbing
  private final class Buf {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Buf = { out.write(v & 0xFF); this }
    def u16(v: Int): Buf = { u8(v); u8(v >> 8) }
    def i32(v: Int): Buf = { u16(v); u16(v >> 16) }
    def f64(d: Double): Buf = {
      var bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { u8((bits & 0xFF).toInt); bits >>= 8; i += 1 }
      this
    }
    def bytes(b: Array[Byte]): Buf = { out.write(b); this }
    def result: Array[Byte] = out.toByteArray
    def size: Int = out.size()
  }

  private def rec(id: Int, data: Array[Byte]): Array[Byte] =
    new Buf().u16(id).u16(data.length).bytes(data).result

  private def bof(substreamType: Int): Array[Byte] =
    rec(0x0809, new Buf().u16(0x0600).u16(substreamType)
      .u16(0x0DBB).u16(0x07CC).i32(0).i32(0x0600).result)
  private val eof = rec(0x000A, Array.emptyByteArray)

  private def boundSheet(pos: Int, name: String): Array[Byte] = {
    val nm = XlsxWriter.safeSheetName(name)
    val wide = nm.exists(_ > 0xFF)
    val b = new Buf().i32(pos).u8(0).u8(0).u8(nm.length)
      .u8(if (wide) 1 else 0)
    nm.foreach(c => if (wide) b.u16(c) else b.u8(c))
    rec(0x0085, b.result)
  }

  // --------------------------------------------------------- cell encode
  /** Signed 30-bit RK-integer range. */
  private def rkIntable(v: Long): Boolean =
    v >= -(1L << 29) && v < (1L << 29)
  /** An RK float drops the low 34 bits of the IEEE encoding — exact
    * only when they are zero. */
  private def rkFloatable(d: Double): Boolean =
    (java.lang.Double.doubleToLongBits(d) & 0x3FFFFFFFFL) == 0L &&
      !d.isNaN

  private def rkCell(row: Int, c: Int, rkv: Int): Array[Byte] =
    rec(0x027E, new Buf().u16(row).u16(c).u16(0).i32(rkv).result)
  private def numberCell(row: Int, c: Int, d: Double): Array[Byte] =
    rec(0x0203, new Buf().u16(row).u16(c).u16(0).f64(d).result)
  private def boolCell(row: Int, c: Int, v: Boolean): Array[Byte] =
    rec(0x0205, new Buf().u16(row).u16(c).u16(0)
      .u8(if (v) 1 else 0).u8(0).result)
  private def labelSstCell(row: Int, c: Int, isst: Int): Array[Byte] =
    rec(0x00FD, new Buf().u16(row).u16(c).u16(0).i32(isst).result)

  /** Workbook-shared string table, indices in first-appearance order. */
  private final class Sst {
    private val idx = new java.util.LinkedHashMap[String, java.lang.Integer]()
    var total = 0
    def intern(s: String): Int = {
      total += 1
      val got = idx.get(s)
      if (got != null) got.intValue()
      else { val i = idx.size(); idx.put(s, i); i }
    }
    def strings: Seq[String] = {
      val out = ArrayBuffer[String]()
      idx.forEach((s, _) => out += s)
      out.toSeq
    }
  }

  /** SST record + CONTINUE records under the data cap, splitting inside
    * character data when a string does not fit; every continuation
    * fragment re-states its flag byte, per the format. */
  private def sstRecords(strings: Seq[String], total: Int): Array[Byte] = {
    val segs = ArrayBuffer[Buf]()
    var cur = new Buf()
    segs += cur
    def room: Int = RecCap - cur.size
    def newSeg(): Unit = { cur = new Buf(); segs += cur }
    cur.i32(total).i32(strings.length)
    strings.foreach { s =>
      val wide = s.exists(_ > 0xFF)
      val cw = if (wide) 2 else 1
      if (room < 3 + cw) newSeg()
      cur.u16(s.length).u8(if (wide) 1 else 0)
      var i = 0
      while (i < s.length) {
        if (room < cw) { newSeg(); cur.u8(if (wide) 1 else 0) }
        val take = math.min(s.length - i, room / cw)
        var j = 0
        while (j < take) {
          val c = s.charAt(i + j)
          if (wide) cur.u16(c) else cur.u8(c)
          j += 1
        }
        i += take
      }
    }
    val first = rec(0x00FC, segs.head.result)
    first ++ segs.tail.toArray.flatMap(b => rec(0x003C, b.result))
  }

  private def cellRecord(sst: Sst, row: Int, c: Int, v: Any)
      : Option[Array[Byte]] = v match {
    case null => None // omitted: absence IS the null encoding
    case b: Boolean => Some(boolCell(row, c, b))
    case n: Byte => Some(intCell(sst, row, c, n.toLong))
    case n: Short => Some(intCell(sst, row, c, n.toLong))
    case n: Int => Some(intCell(sst, row, c, n.toLong))
    case n: Long => Some(intCell(sst, row, c, n))
    case n: Float => Some(floatCell(row, c, n.toDouble))
    case n: Double => Some(floatCell(row, c, n))
    case n: java.math.BigDecimal => Some(floatCell(row, c, n.doubleValue()))
    case n: BigDecimal => Some(floatCell(row, c, n.toDouble))
    case other =>
      Some(labelSstCell(row, c, sst.intern(other.toString)))
  }

  private def intCell(sst: Sst, row: Int, c: Int, v: Long): Array[Byte] =
    if (rkIntable(v)) rkCell(row, c, (v.toInt << 2) | 2)
    else if (math.abs(v) < (1L << 53)) numberCell(row, c, v.toDouble)
    // beyond the double-exact integer range the IEEE cell would lie —
    // fall back to the string encoding (reader casts tolerate it)
    else labelSstCell(row, c, sst.intern(v.toString))

  private def floatCell(row: Int, c: Int, d: Double): Array[Byte] =
    if (rkFloatable(d))
      rkCell(row, c, (java.lang.Double.doubleToLongBits(d) >>> 32).toInt)
    else numberCell(row, c, d)

  // --------------------------------------------------- workbook assembly
  /** The bare BIFF8 workbook STREAM (globals substream + one worksheet
    * substream per sheet) — public so callers can exercise the
    * container-less form [[graft.ingest.XlsSheetReader]] tolerates
    * (some exporters write exactly this; so does the tolerance gate).
    * Streams each DataFrame once via `toLocalIterator`. */
  def workbookStreamBytes(sheets: Seq[(String, DataFrame)],
                          maxRows: Int = Biff8MaxRows): Array[Byte] = {
    require(sheets.nonEmpty, "at least one sheet")
    require(maxRows <= Biff8MaxRows,
      s"BIFF8 holds at most $Biff8MaxRows rows per sheet, got $maxRows")
    // distinct AFTER sanitization — 'Plan:1' and 'Plan*1' both sanitize
    // to 'Plan1' and duplicate BOUNDSHEET names make readSheet(sheet=…)
    // silently resolve to the first (same guard as XlsxWriter)
    val safeNames = sheets.map { case (n, _) => XlsxWriter.safeSheetName(n) }
    require(safeNames.distinct.size == safeNames.size,
      s"sheet names collide after sanitization: $safeNames")
    val sst = new Sst
    val sheetBodies = sheets.map { case (_, df) =>
      val cols = df.columns.toSeq
      require(cols.size <= Biff8MaxCols,
        s"BIFF8 holds at most $Biff8MaxCols columns, got ${cols.size}")
      val body = new Buf()
      cols.zipWithIndex.foreach { case (name, c) =>
        body.bytes(labelSstCell(0, c, sst.intern(name)))
      }
      var r = 1
      val it = df.toLocalIterator()
      while (it.hasNext) {
        require(r < maxRows, s"sheet exceeds $maxRows rows " +
          "(BIFF8 is a bounded presentation artifact — use the " +
          "parquet/CSV sinks for bulk data)")
        val row = it.next().asInstanceOf[Row]
        var c = 0
        while (c < cols.size) {
          cellRecord(sst, r, c, row.get(c)).foreach(body.bytes)
          c += 1
        }
        r += 1
      }
      body.result
    }
    val bodies = sheetBodies.map(b => bof(0x0010) ++ b ++ eof)
    // BOUNDSHEET offsets need the globals size, which depends only on
    // record SIZES (names + SST), not offsets — so build globals twice
    def globals(offsets: Seq[Int]): Array[Byte] =
      bof(0x0005) ++
        sheets.map(_._1).zip(offsets).toArray.flatMap { case (n, off) =>
          boundSheet(off, n) } ++
        sstRecords(sst.strings, sst.total) ++ eof
    val g0 = globals(sheets.map(_ => 0))
    val offsets = bodies.scanLeft(g0.length)(_ + _.length).init
    globals(offsets) ++ bodies.toArray.flatten
  }

  /** Wrap a workbook stream as a v3 compound file (512-byte sectors,
    * single `Workbook` stream). Two layouts, both real-world shapes:
    * the default regular-sector layout pads the stream to the
    * 4096-byte cutoff (zero padding after the final EOF is the
    * reader's documented terminator); with `mini = true` a stream
    * UNDER the cutoff is laid out the way small real workbooks are —
    * carved into 64-byte mini sectors inside the root entry's
    * mini-stream, chained through a mini-FAT sector — exercising the
    * reader's second sector-resolution path end-to-end. */
  def cfb(stream0: Array[Byte], mini: Boolean = false): Array[Byte] = {
    val FreeSect = 0xFFFFFFFF
    val EndOfChain = 0xFFFFFFFE
    val FatSect = 0xFFFFFFFD
    val useMini = mini && stream0.length < 4096
    require(!mini || useMini,
      s"mini layout holds streams under 4096 bytes, got ${stream0.length}")
    // regular-sector payload: the stream itself (≥ 4096 keeps it out
    // of the mini-FAT), or the 64-byte-mini-sector container holding it
    val payload =
      if (useMini) java.util.Arrays.copyOf(stream0,
        (stream0.length + 63) / 64 * 64)
      else java.util.Arrays.copyOf(stream0,
        math.max(4096, (stream0.length + 511) / 512 * 512))
    val paddedPayload =
      java.util.Arrays.copyOf(payload, (payload.length + 511) / 512 * 512)
    val nPayload = paddedPayload.length / 512
    val extra = if (useMini) 1 else 0 // one mini-FAT sector
    val fatCount = (1 + extra + nPayload + 126) / 127
    val dirSect = fatCount
    val miniFatSect = fatCount + 1 // only meaningful when mini
    val firstPayload = fatCount + 1 + extra
    val fat = Array.fill(fatCount * 128)(FreeSect)
    (0 until fatCount).foreach(i => fat(i) = FatSect)
    fat(dirSect) = EndOfChain
    if (useMini) fat(miniFatSect) = EndOfChain
    (0 until nPayload).foreach { j =>
      fat(firstPayload + j) =
        if (j == nPayload - 1) EndOfChain else firstPayload + j + 1
    }
    def dirEntry(name: String, tpe: Int, child: Int, start: Int,
                 size: Int): Array[Byte] = {
      val b = new Buf()
      name.foreach(c => b.u16(c))
      (name.length until 32).foreach(_ => b.u16(0))
      b.u16(if (name.isEmpty) 0 else (name.length + 1) * 2)
      b.u8(tpe).u8(1)
      b.i32(FreeSect).i32(FreeSect).i32(child)
      (0 until 16).foreach(_ => b.u8(0))
      b.i32(0)
      b.i32(0).i32(0).i32(0).i32(0)
      b.i32(start).i32(size).i32(0)
      b.result
    }
    val h = new Buf()
    h.i32(0xE011CFD0).i32(0xE11AB1A1)
    (0 until 16).foreach(_ => h.u8(0))
    h.u16(0x003E).u16(0x0003)
    h.u16(0xFFFE)
    h.u16(9).u16(6)
    (0 until 6).foreach(_ => h.u8(0))
    h.i32(0)
    h.i32(fatCount)
    h.i32(dirSect)
    h.i32(0)
    h.i32(4096)
    h.i32(if (useMini) miniFatSect else EndOfChain).i32(extra)
    h.i32(EndOfChain).i32(0) // no DIFAT chain
    (0 until 109).foreach(i => h.i32(if (i < fatCount) i else FreeSect))
    require(h.size == 512)
    val body = new Buf()
    fat.foreach(body.i32)
    // directory: in mini mode the root's chain IS the mini-stream
    body.bytes(dirEntry("Root Entry", 5, 1,
      if (useMini) firstPayload else EndOfChain,
      if (useMini) payload.length else 0))
    // declared size is the TRUE stream length (strict CFB readers treat
    // trailing declared bytes as content; the sector chain already covers
    // the padding) — EXCEPT a regular-layout stream under the 4096-byte
    // mini cutoff, which must declare ≥ 4096 or compliant readers resolve
    // it through the mini-stream it is not in (MS-CFB cutoff rule)
    body.bytes(dirEntry("Workbook", 2, FreeSect,
      if (useMini) 0 else firstPayload,
      if (useMini) stream0.length else math.max(stream0.length, 4096)))
    body.bytes(dirEntry("", 0, FreeSect, 0, 0))
    body.bytes(dirEntry("", 0, FreeSect, 0, 0))
    if (useMini) {
      val nMini = (stream0.length + 63) / 64
      val mf = new Buf()
      (0 until nMini).foreach(j =>
        mf.i32(if (j == nMini - 1) EndOfChain else j + 1))
      (nMini until 128).foreach(_ => mf.i32(FreeSect))
      body.bytes(mf.result)
    }
    body.bytes(paddedPayload)
    h.result ++ body.result
  }

  /** Write a real `.xls`: BIFF8 stream in a CFB container. Pass
    * `mini = true` for a sub-4096-byte workbook laid out through the
    * mini-FAT (the small-file shape in the wild). */
  def writeWorkbook(path: String, sheets: Seq[(String, DataFrame)],
                    maxRows: Int = Biff8MaxRows,
                    mini: Boolean = false): Unit = {
    val bytes = cfb(workbookStreamBytes(sheets, maxRows), mini)
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.write(Paths.get(path), bytes)
  }
}
