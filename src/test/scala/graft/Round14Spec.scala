package graft

import org.apache.spark.sql.functions._
import graft.ingest.RawSheetReader
import graft.queries.{Round14, Round14Fixtures}

/** Round-14 semantic pins for the ingest-tier gates: header positions
  * discovered per file (alias scan at row 4 and row 1, fallback at the
  * configured index), duplicate-column collapse ORDER, DSv2-vs-RDD
  * path equality on the same pathological fixture, and the E1 e2e
  * resumen invariants. The hash-level truth lives in the
  * `ingest_*`/`pipeline_ingest_e2e` DuckDB gates; these pin the
  * intermediate decisions those hashes can't name. */
class Round14Spec extends SparkTestBase {

  private lazy val root = Round14Fixtures.ensure()
  private val cfg = Round14.cfg

  test("torre_a: header found by alias scan at row 4; cleaning resolves " +
    "accents, whitespace runs, dup suffixes and the unnamed column") {
    val df = RawSheetReader.readSheet(spark, s"$root/torre_a.csv",
      "Capadocia", cfg)
    assert(df.columns.toSet === Set("_file_row", "Numero de inmueble",
      "Precio de lista", "Estado de inmueble", "Area total", "Tipologia",
      "col_sin_nombre", "Proyecto"))
    val rows = df.orderBy("_file_row").collect()
    assert(rows.length === 48)
    // first data row sits just under the header (file line 5)
    assert(rows.head.getAs[Long]("_file_row") === 5L)
    assert(rows.head.getAs[String]("Numero de inmueble") === "101")
  }

  test("torre_a: short rows pad with nulls; empty cells read as null") {
    val df = RawSheetReader.readSheet(spark, s"$root/torre_a.csv",
      "Capadocia", cfg)
    // i=11 writes only 4 of 7 fields → area/tipologia/obs all null
    val short = df.where(col("Numero de inmueble") === "111").collect()(0)
    assert(short.getAs[String]("Area total") == null)
    assert(short.getAs[String]("Tipologia") == null)
    assert(short.getAs[String]("col_sin_nombre") == null)
    // i=7 has an empty estado cell (7 % 7 == 0)
    val est = df.where(col("Numero de inmueble") === "107")
      .select("Estado de inmueble").collect()(0)
    assert(est.isNullAt(0))
  }

  test("dup collapse keeps the FIRST non-null in suffix order") {
    val df = RawSheetReader.readSheet(spark, s"$root/dup_cols.csv",
      "DupFix", cfg)
    val byNum = df.select("Numero de inmueble", "Precio de lista")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // i=12: all three copies present → first copy (i*10+1) wins
    assert(byNum("D012") === "121")
    // i=3: only the second copy present → it wins
    assert(byNum("D003") === "32")
    // i=4: copies 1 and 3 present → first wins
    assert(byNum("D004") === "41")
    // i=1: none present → null
    assert(byNum("D001") == null)
  }

  test("torre_c: no alias in the first 15 rows -> fallback header row 4, " +
    "raw names kept, canonical columns ensured as nulls") {
    val df = RawSheetReader.readSheet(spark, s"$root/torre_c.csv",
      "SinAlias", cfg)
    assert(Set("Lote", "Monto", "Observacion").subsetOf(df.columns.toSet))
    assert(df.count() === 12)
    assert(df.where(col("Numero de inmueble").isNotNull).count() === 0)
  }

  test("DSv2 source and RDD reader resolve torre_a row-for-row alike") {
    val rdd = RawSheetReader.readSheet(spark, s"$root/torre_a.csv",
      "Capadocia", cfg)
    val dsv2 = spark.read.format("graft.sources.RawSheetDataSource")
      .options(graft.sources.RawSheetSource.options(cfg, "Capadocia"))
      .load(s"$root/torre_a.csv")
    val cols = rdd.columns.sorted.map(col(_))
    assert(rdd.select(cols: _*).except(dsv2.select(cols: _*)).count() === 0)
    assert(dsv2.select(cols: _*).except(rdd.select(cols: _*)).count() === 0)
  }

  test("e2e resumen: registros per project, match count sanity, and the " +
    "isClose equal-price row counting as Sin_Cambio") {
    val res = Round14.defs("pipeline_ingest_e2e")(spark, sf)
      .collect().map(r => r.getAs[String]("proyecto") -> r).toMap
    assert(res("Capadocia").getAs[Long]("registros") === 48L)
    assert(res("Matera").getAs[Long]("registros") === 30L)
    // 16 distinct Capadocia keys + 7 Matera keys in the CRM fixture
    assert(res("Capadocia").getAs[Long]("con_match") === 16L)
    assert(res("Matera").getAs[Long]("con_match") === 7L)
    // i=4 carries an exactly-equal CRM price and no estado: it must be
    // matched-but-unchanged, so Sin_Cambio >= 1 on Capadocia
    assert(res("Capadocia").getAs[Long]("sin_cambio") >= 1L)
    // percentages are count/registros rounded at 4
    val c = res("Capadocia")
    assert(c.getAs[Double]("pct_con_match") ===
      math.floor(16.0 / 48.0 * 1e4 + 0.5) / 1e4)
  }

  test("global shuffle: same seed is stable, different seed permutes, " +
    "positions are contiguous per shard, union covers the corpus") {
    import spark.implicits._
    val ids = (1L to 500L).toDF("doc_id")
    def run(seed: String) = graft.operators.GlobalShuffle
      .shuffle(ids, col("doc_id"), seed, 8)
      .select("shard", "pos", "id")
    val a = run("alpha").collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val a2 = run("alpha").collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = run("beta").collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a === a2)           // reproducible
    assert(a !== b)            // seed actually permutes
    assert(a.map(_._3).toSet === (1L to 500L).toSet) // total, no loss
    // per shard: positions are exactly 1..count
    a.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted === (1L to rows.length).toSeq)
    }
    // rough balance: no shard is empty or hogs half the corpus
    val sizes = a.groupBy(_._1).map(_._2.size)
    assert(sizes.size === 8 && sizes.max < 250)
  }

}
