package graft

import graft.functions.LocaleNum
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class LocaleNumSpec extends SparkTestBase {

  private def p(s: String): Option[Double] =
    Option(LocaleNum.parseString(s)).map(_.doubleValue)

  test("locale parse — table-driven reference cases (F3, ref :104-128)") {
    assert(p("1.234.567,89") === Some(1234567.89))
    assert(p("1,234,567.89") === Some(1234567.89))
    // >1 dot: reference folds all groups but the LAST into the integer part
    // and keeps the last group as decimals (`:121-124`): 1.234.567 -> 1234.567
    assert(p("1.234.567") === Some(1234.567))
    assert(p("1.234") === Some(1.234)) // single dot => decimal
    assert(p("1,234") === Some(1.234)) // lone comma => decimal
    assert(p("1234,56") === Some(1234.56))
    assert(p(" 1 234,56 ") === Some(1234.56)) // internal spaces stripped
    assert(p("-1.234,5") === Some(-1234.5))
    assert(p("12") === Some(12.0))
    assert(p("12.5e2") === Some(1250.0))
    assert(p("") === None)
    assert(p("   ") === None)
    assert(p("abc") === None)
    assert(p("12abc") === None)
    assert(p("1,23,4") === None) // multiple commas -> unparseable (ref parity)
    assert(p("NaN") === None) // NaN discipline: never NaN, null instead
    assert(p("Infinity") === None)
    assert(p("1.5f") === None) // java-isms rejected
    assert(p(null) === None)
  }

  test("locale parse — property: round-trips generated locale renderings") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val i = math.abs(rnd.nextLong()) % 99999999L
      val d = rnd.nextInt(100)
      val en = "%,d".format(i) + f".$d%02d"
      val es = "%,d".format(i).replace(",", ".") + f",$d%02d"
      val expected = i + d / 100.0
      assert(math.abs(p(es).get - expected) < 1e-9, s"es: $es")
      assert(math.abs(p(en).get - expected) < 1e-9, s"en: $en")
    }
  }

  test("expression works in a plan (codegen path) and under SQL registration") {
    import spark.implicits._
    val df = Seq("1.234,5", "1,234.5", "garbage", "1.100.100", null)
      .toDF("s")
      .select(localeNum(col("s")).as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ===
      Seq(Some(1234.5), Some(1234.5), None, Some(1100.1), None))

    graft.functions.GraftFunctions.register(spark)
    val viaSql = Seq("7.654,3").toDF("s").createOrReplaceTempView("ln_t")
    assert(spark.sql("SELECT locale_num(s) FROM ln_t").head().getDouble(0) === 7654.3)
  }

  test("safe_num — F4 sentinel + es-PE fixed locale (ref python_json.py:64-78)") {
    import spark.implicits._
    val in = Seq("1.234.567,89", "N/A", "-", "", "1234", "12,5", "x").toDF("s")
    val got = in.select(safeNum(col("s")).as("v")).collect().map(r => Option(r.get(0)))
    assert(got.toSeq === Seq(Some(1234567.89), None, None, None, Some(1234.0), Some(12.5), None))
  }
}
