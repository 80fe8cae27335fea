package graft

import java.io.ByteArrayOutputStream
import scala.collection.mutable.ArrayBuffer

/** Test-scope BIFF8 + CFB *writer* — builds real legacy `.xls` workbooks
  * for [[graft.ingest.XlsSheetReader]] to read, since the reference
  * repo's actual `.xls` price lists are stripped from its git history
  * (`.MISSING_LARGE_BLOBS`). Written independently from the reader,
  * straight from the public MS-CFB / MS-XLS layouts, so the spec is two
  * implementations of the format agreeing — the same cross-check shape
  * the xlsx path gets from `tools/xlsx_fixtures.py`.
  *
  * Deliberately exercises the format's awkward corners: all four RK
  * encodings, MULRK/MULBLANK runs, FORMULA cached numeric/boolean/
  * string results (the string via a trailing STRING record), BOOLERR,
  * and an SST large enough to force CONTINUE splits *inside* the
  * character data of both compressed and UTF-16 strings (flag byte
  * re-stated per fragment).
  */
object XlsFixture {

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

  // ------------------------------------------------------------ records
  private def bof(substreamType: Int): Array[Byte] =
    rec(0x0809, new Buf().u16(0x0600).u16(substreamType)
      .u16(0x0DBB).u16(0x07CC).i32(0).i32(0x0600).result)
  private val eof = rec(0x000A, Array.emptyByteArray)

  private def boundSheet(pos: Int, name: String): Array[Byte] = {
    val b = new Buf().i32(pos).u8(0).u8(0).u8(name.length).u8(0)
    name.foreach(c => b.u8(c)) // compressed sheet name
    rec(0x0085, b.result)
  }

  def rkInt(v: Int): Int = (v << 2) | 2
  def rkInt100(v: Int): Int = (v << 2) | 3
  def rkFloat(d: Double): Int = {
    val hi = (java.lang.Double.doubleToLongBits(d) >>> 32).toInt
    require((hi & 3) == 0, s"$d not RK-float representable in this fixture")
    hi
  }
  def rkFloat100(d: Double): Int = rkFloat(d) | 1

  def number(row: Int, col: Int, d: Double): Array[Byte] =
    rec(0x0203, new Buf().u16(row).u16(col).u16(0).f64(d).result)
  def rk(row: Int, col: Int, rkv: Int): Array[Byte] =
    rec(0x027E, new Buf().u16(row).u16(col).u16(0).i32(rkv).result)
  def mulRk(row: Int, colFirst: Int, rks: Seq[Int]): Array[Byte] = {
    val b = new Buf().u16(row).u16(colFirst)
    rks.foreach(v => b.u16(0).i32(v))
    b.u16(colFirst + rks.length - 1)
    rec(0x00BD, b.result)
  }
  def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, new Buf().u16(row).u16(col).u16(0).i32(isst).result)
  def label(row: Int, col: Int, s: String): Array[Byte] = {
    val b = new Buf().u16(row).u16(col).u16(0).u16(s.length)
    val wide = s.exists(_ > 0xFF)
    b.u8(if (wide) 1 else 0)
    s.foreach(c => if (wide) b.u16(c) else b.u8(c))
    rec(0x0204, b.result)
  }
  def boolErr(row: Int, col: Int, v: Boolean): Array[Byte] =
    rec(0x0205, new Buf().u16(row).u16(col).u16(0)
      .u8(if (v) 1 else 0).u8(0).result)
  def blank(row: Int, col: Int): Array[Byte] =
    rec(0x0201, new Buf().u16(row).u16(col).u16(0).result)
  def mulBlank(row: Int, colFirst: Int, n: Int): Array[Byte] = {
    val b = new Buf().u16(row).u16(colFirst)
    (0 until n).foreach(_ => b.u16(0))
    b.u16(colFirst + n - 1)
    rec(0x00BE, b.result)
  }
  def formulaNum(row: Int, col: Int, d: Double): Array[Byte] =
    rec(0x0006, new Buf().u16(row).u16(col).u16(0).f64(d)
      .u16(0).i32(0).u16(0).result)
  def formulaBool(row: Int, col: Int, v: Boolean): Array[Byte] =
    rec(0x0006, new Buf().u16(row).u16(col).u16(0)
      .u8(1).u8(0).u8(if (v) 1 else 0).u8(0).u8(0).u8(0).u16(0xFFFF)
      .u16(0).i32(0).u16(0).result)
  /** FORMULA whose cached result is the STRING record that follows. */
  def formulaStr(row: Int, col: Int, s: String): Array[Byte] = {
    val f = rec(0x0006, new Buf().u16(row).u16(col).u16(0)
      .u8(0).u8(0).u8(0).u8(0).u8(0).u8(0).u16(0xFFFF)
      .u16(0).i32(0).u16(0).result)
    val b = new Buf().u16(s.length)
    val wide = s.exists(_ > 0xFF)
    b.u8(if (wide) 1 else 0)
    s.foreach(c => if (wide) b.u16(c) else b.u8(c))
    f ++ rec(0x0207, b.result)
  }

  // ------------------------------------------------- SST with CONTINUEs
  /** SST + CONTINUE records under a data-size cap, splitting inside
    * character data whenever a string does not fit — every continuation
    * fragment re-states its flag byte, per the format. */
  def sst(strings: Seq[String], total: Int, cap: Int = 8224): Array[Byte] = {
    val segs = ArrayBuffer[Buf]()
    var cur = new Buf()
    segs += cur
    def room: Int = cap - cur.size
    def newSeg(): Unit = { cur = new Buf(); segs += cur }
    cur.i32(total).i32(strings.length)
    strings.foreach { s =>
      val wide = s.exists(_ > 0xFF)
      val cw = if (wide) 2 else 1
      // header (3 bytes) + at least one char must fit in this segment
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
    first ++ segs.tail.flatMap(b => rec(0x003C, b.result))
  }

  // --------------------------------------------------- workbook assembly
  /** Globals + one worksheet substream; BOUNDSHEET offset patched via a
    * second pass (its own record size is position-independent). */
  def workbookStream(sheetName: String, sstStrings: Seq[String],
                     sstTotal: Int, cellRecords: Seq[Array[Byte]],
                     sstCap: Int = 8224): Array[Byte] = {
    val sheet = bof(0x0010) ++ cellRecords.flatten ++ eof
    def globals(pos: Int) = bof(0x0005) ++ boundSheet(pos, sheetName) ++
      sst(sstStrings, sstTotal, sstCap) ++ eof
    val g = globals(0)
    globals(g.length) ++ sheet
  }

  // ------------------------------------------------------------ CFB box
  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD

  private def dirEntry(name: String, tpe: Int, child: Int, start: Int,
                       size: Int): Array[Byte] = {
    val b = new Buf()
    name.foreach(c => b.u16(c))
    (name.length until 32).foreach(_ => b.u16(0))
    b.u16(if (name.isEmpty) 0 else (name.length + 1) * 2)
    b.u8(tpe).u8(1) // color: black
    b.i32(FreeSect).i32(FreeSect).i32(child) // left, right, child
    (0 until 16).foreach(_ => b.u8(0)) // clsid
    b.i32(0) // state bits
    b.i32(0).i32(0).i32(0).i32(0) // timestamps
    b.i32(start).i32(size).i32(0)
    b.result
  }

  /** Wrap a stream as a v3 (512-byte-sector) compound file with a
    * single `Workbook` stream. Streams at or above the 4096-byte
    * mini-stream cutoff go in regular sectors (the common shape for
    * real workbooks — the default path pads to 4096, and the reader
    * treats zero padding after the final EOF as end); smaller streams
    * exercise the mini-FAT/mini-stream layout instead. */
  def cfb(stream0: Array[Byte], forceMini: Boolean = false): Array[Byte] = {
    val mini = forceMini && stream0.length < 4096
    // regular-sector payload: the stream itself, or the mini-stream
    // container (64-byte mini sectors) holding it
    val payload =
      if (mini) java.util.Arrays.copyOf(stream0,
        (stream0.length + 63) / 64 * 64)
      else java.util.Arrays.copyOf(stream0,
        math.max(4096, (stream0.length + 511) / 512 * 512))
    val paddedPayload =
      java.util.Arrays.copyOf(payload, (payload.length + 511) / 512 * 512)
    val nPayload = paddedPayload.length / 512
    val extra = if (mini) 1 else 0 // one mini-FAT sector
    val fatCount = (1 + extra + nPayload + 126) / 127
    val dirSect = fatCount
    val miniFatSect = fatCount + 1 // only meaningful when mini
    val firstPayload = fatCount + 1 + extra
    val totalSectors = firstPayload + nPayload
    val fat = Array.fill(fatCount * 128)(FreeSect)
    (0 until fatCount).foreach(i => fat(i) = FatSect)
    fat(dirSect) = EndOfChain
    if (mini) fat(miniFatSect) = EndOfChain
    (0 until nPayload).foreach { j =>
      fat(firstPayload + j) =
        if (j == nPayload - 1) EndOfChain else firstPayload + j + 1
    }
    require(totalSectors <= fat.length)

    val h = new Buf()
    h.i32(0xE011CFD0).i32(0xE11AB1A1) // signature
    (0 until 16).foreach(_ => h.u8(0)) // clsid
    h.u16(0x003E).u16(0x0003) // minor, major (v3)
    h.u16(0xFFFE) // little-endian
    h.u16(9).u16(6) // sector / mini-sector shifts
    (0 until 6).foreach(_ => h.u8(0))
    h.i32(0) // dir sector count (0 for v3)
    h.i32(fatCount)
    h.i32(dirSect) // first directory sector
    h.i32(0) // transaction signature
    h.i32(4096) // mini-stream cutoff
    h.i32(if (mini) miniFatSect else EndOfChain).i32(extra) // mini-FAT
    h.i32(EndOfChain).i32(0) // no DIFAT chain
    (0 until 109).foreach(i => h.i32(if (i < fatCount) i else FreeSect))
    require(h.size == 512)

    val body = new Buf()
    fat.foreach(body.i32) // FAT sectors (fatCount * 512 bytes)
    // directory: in mini mode the root's chain IS the mini-stream
    body.bytes(dirEntry("Root Entry", 5, 1,
      if (mini) firstPayload else EndOfChain,
      if (mini) payload.length else 0))
    body.bytes(dirEntry("Workbook", 2, FreeSect,
      if (mini) 0 else firstPayload,
      if (mini) stream0.length else payload.length))
    body.bytes(dirEntry("", 0, FreeSect, 0, 0))
    body.bytes(dirEntry("", 0, FreeSect, 0, 0))
    if (mini) {
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
}
