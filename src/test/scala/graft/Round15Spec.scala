package graft

import org.apache.spark.sql.functions._
import graft.ingest.XlsSheetReader
import graft.operators.Kappa
import graft.sinks.XlsWriter

/** Round-15 surface: the BIFF8 WRITER (typed cells, SST CONTINUE
  * splits, determinism, caps), Fleiss' kappa properties, and the
  * keyed-quantile rank-error envelope the gate reports. */
class Round15Spec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("r15").resolve(name).toString

  test("xls writer: every typed-cell encoding survives the round trip " +
    "through the independent BIFF8 reader") {
    val df = Seq(
      (1L, 5.25, "plain", Some(true)),
      (536870911L, 2.5, "wide → Δ", Some(false)), // RK-int max, RK float
      (536870912L, 711.56, "ñandú", None), // beyond RK -> NUMBER; latin-1
      (9007199254740993L, -0.0078125, "", None) // beyond 2^53 -> string cell
    ).map { case (a, b, c, d) => (a, b, c, d.map(Boolean.box).orNull) }
      .toDF("id", "v", "s", "flag")
    val path = tmp("typed.xls")
    XlsWriter.writeWorkbook(path, Seq("T" -> df))
    val g = XlsSheetReader.readGrid(path).map(_.toSeq)
    assert(g.head === Seq("id", "v", "s", "flag"))
    assert(g(1) === Seq("1", "5.25", "plain", "1"))
    assert(g(2) === Seq("536870911", "2.5", "wide → Δ", "0"))
    assert(g(3) === Seq("536870912", "711.56", "ñandú", null))
    // 2^53+1 is not double-exact: the writer must fall back to the
    // string encoding rather than emit a lying IEEE cell
    assert(g(4) === Seq("9007199254740993", "-0.0078125", "", null))
  }

  test("xls writer: byte-deterministic, multi-sheet tab order, shared " +
    "SST splits across CONTINUE records when it outgrows one record") {
    // 900 distinct 16-char strings ≈ 17 kB of SST payload -> >= 2
    // CONTINUE records; plus cross-sheet string sharing
    val many = (0 until 900).map(i => (i.toLong, f"texto_compart_$i%03d"))
      .toDF("k", "s").orderBy("k")
    val few = Seq((0L, "texto_compart_000"), (1L, "solo_aqui"))
      .toDF("k", "s").orderBy("k")
    val b1 = XlsWriter.cfb(XlsWriter.workbookStreamBytes(
      Seq("Muchos" -> many, "Pocos" -> few)))
    val b2 = XlsWriter.cfb(XlsWriter.workbookStreamBytes(
      Seq("Muchos" -> many, "Pocos" -> few)))
    assert(java.util.Arrays.equals(b1, b2), "same data, same bytes")
    val path = tmp("sst.xls")
    java.nio.file.Files.write(java.nio.file.Paths.get(path), b1)
    assert(XlsSheetReader.sheetNames(path) === Seq("Muchos", "Pocos"))
    val muchos = XlsSheetReader.readGrid(path, Some("Muchos"))
    assert(muchos.length === 901)
    assert(muchos(1).toSeq === Seq("0", "texto_compart_000"))
    assert(muchos(900).toSeq === Seq("899", "texto_compart_899"))
    val pocos = XlsSheetReader.readGrid(path, Some("Pocos"))
    assert(pocos(2).toSeq === Seq("1", "solo_aqui"))
  }

  test("xls writer: the BIFF8 row cap is a hard guard, not a silent cut") {
    val df = (1 to 10).map(i => (i, s"r$i")).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      XlsWriter.workbookStreamBytes(Seq("S" -> df), maxRows = 5)
    }
    assert(e.getMessage.contains("exceeds 5 rows"))
  }

  test("fleiss kappa: perfect panel agreement is 1, input row order is " +
    "irrelevant, and the degenerate one-label panel lands on the " +
    "cohen convention") {
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("item", "label")
    val k1 = Kappa.fleiss(perfect, col("item"), col("label"), 2)
      .head()
    assert(k1.getAs[Double]("p_bar") === 1.0 &&
      k1.getAs[Double]("kappa") === 1.0)
    // order invariance: the statistic is a pure function of counts
    val rows = Seq(("i1", "y"), ("i1", "y"), ("i1", "n"),
      ("i2", "n"), ("i2", "y"), ("i2", "n"))
    val fwd = Kappa.fleiss(rows.toDF("item", "label"),
      col("item"), col("label"), 3).head()
    val rev = Kappa.fleiss(rows.reverse.toDF("item", "label"),
      col("item"), col("label"), 3).head()
    assert(fwd.toSeq === rev.toSeq)
    assert(fwd.getAs[Double]("kappa") === -0.333333)
    // every rating one label: p_e = 1, p_bar = 1 -> kappa = 1
    val mono = Seq(("a", "x"), ("a", "x"), ("b", "x"), ("b", "x"))
      .toDF("item", "label")
    val k3 = Kappa.fleiss(mono, col("item"), col("label"), 2).head()
    assert(k3.getAs[Double]("p_e") === 1.0 &&
      k3.getAs[Double]("kappa") === 1.0)
  }

  test("keyed streaming quantile sits inside the documented rank-error " +
    "envelope on the gate surface (the gate's ok column)") {
    val rows = SparkEntry.queries("stream_quantile_rank_error")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok"),
        s"|rank_frac - p| > ${graft.queries.Round15.RankEps} at " +
          s"${r.getAs[String]("event_type")}/${r.getAs[String]("prob")}: " +
          s"rank_frac ${r.getAs[Double]("rank_frac")}")
    }
  }

  test("xls writer: negative values survive every encoding (RK ints " +
    "are arithmetic-shift-decoded, RK floats keep the sign bit)") {
    val df = Seq(
      (-1L, -2.5, "neg rk float"), // -1 RK int; -2.5 low-34-zero RK float
      (-536870912L, -711.56, "rk int min"), // RK range edge; NUMBER
      (-536870913L, -0.0078125, "below rk range")) // NUMBER int; RK float
      .toDF("id", "v", "s")
    val path = tmp("neg.xls")
    XlsWriter.writeWorkbook(path, Seq("N" -> df))
    val g = XlsSheetReader.readGrid(path).map(_.toSeq)
    assert(g(1) === Seq("-1", "-2.5", "neg rk float"))
    assert(g(2) === Seq("-536870912", "-711.56", "rk int min"))
    assert(g(3) === Seq("-536870913", "-0.0078125", "below rk range"))
  }

  test("xls writer: non-latin sheet names take the UTF-16 BOUNDSHEET " +
    "encoding and read back exactly") {
    val df = Seq((1L, "x")).toDF("k", "s")
    val path = tmp("wide.xls")
    XlsWriter.writeWorkbook(path, Seq("Ξ数据" -> df, "plain" -> df))
    assert(XlsSheetReader.sheetNames(path) === Seq("Ξ数据", "plain"))
    assert(XlsSheetReader.readGrid(path, Some("Ξ数据"))(1).toSeq ===
      Seq("1", "x"))
  }

  test("two independent BIFF8 writers agree: the production sink and " +
    "the test-scope fixture emitter produce the same logical grid " +
    "through the same reader") {
    // same logical sheet, hand-built from XlsFixture primitives
    // (written against the format spec, not XlsWriter's code) vs the
    // production sink — both read back through XlsSheetReader; a
    // mismatch means one of the three disagrees with MS-XLS
    val fixtureStream = XlsFixture.workbookStream("T",
      sstStrings = Seq("k", "s", "uno", "dos"), sstTotal = 4,
      cellRecords = Seq(
        XlsFixture.labelSst(0, 0, 0), XlsFixture.labelSst(0, 1, 1),
        XlsFixture.rk(1, 0, XlsFixture.rkInt(1)),
        XlsFixture.labelSst(1, 1, 2),
        XlsFixture.number(2, 0, 2.75), XlsFixture.labelSst(2, 1, 3)))
    val fp = tmp("fixture.xls")
    java.nio.file.Files.write(java.nio.file.Paths.get(fp),
      XlsFixture.cfb(fixtureStream))
    // the writer emits LABELSST for a string column where the fixture
    // used typed RK/NUMBER cells — the READER normalizes both to the
    // same grid strings, which is exactly the cross-implementation claim
    val wp = tmp("writer.xls")
    XlsWriter.writeWorkbook(wp, Seq("T" ->
      Seq(("1", "uno"), ("2.75", "dos")).toDF("k", "s")))
    val a = XlsSheetReader.readGrid(fp).map(_.toSeq)
    val b = XlsSheetReader.readGrid(wp).map(_.toSeq)
    assert(a === b, s"fixture grid $a != writer grid $b")
  }

  test("corrupted-container tolerance: the truncated stream loses " +
    "exactly the dangling record, nothing before it") {
    val df = Seq((1L, "uno", "fin1"), (2L, "dos", "fin2"))
      .toDF("k", "s", "t").orderBy("k")
    val stream = XlsWriter.workbookStreamBytes(Seq("D" -> df))
    val path = tmp("trunc.xls")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      stream.dropRight(7)) // EOF + 3 bytes of the last cell record
    val g = XlsSheetReader.readGrid(path).map(_.toSeq)
    assert(g(1) === Seq("1", "uno", "fin1"))
    assert(g(2) === Seq("2", "dos", null), "only the cut cell is lost")
  }
}
