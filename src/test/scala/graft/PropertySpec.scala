package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.LocaleNum

/** ScalaCheck properties for the pure scalar kernels (SURVEY.md §5). */
object LocaleNumProps extends Properties("LocaleNum") {

  private val amount: Gen[(Long, Int)] = for {
    i <- Gen.chooseNum(0L, 999999999999L)
    d <- Gen.chooseNum(0, 99)
  } yield (i, d)

  property("es/en renderings parse to the same value") = forAll(amount) {
    case (i, d) =>
      val en = "%,d".format(i) + f".$d%02d"
      val es = "%,d".format(i).replace(",", ".") + f",$d%02d"
      val expected = i + d / 100.0
      val pe = LocaleNum.parseString(es)
      val pn = LocaleNum.parseString(en)
      pe != null && pn != null &&
        math.abs(pe - expected) < 1e-6 && math.abs(pn - expected) < 1e-6
  }

  property("plain integers parse exactly") = forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { i =>
    LocaleNum.parseString(i.toString) == i.toDouble
  }

  property("garbage never throws, yields null") =
    forAll(Gen.alphaStr.suchThat(s => !s.matches("[+-]?\\d+.*"))) { s =>
      val r = LocaleNum.parseString(s + "x") // force non-numeric
      r == null
    }

  property("whitespace is insignificant") = forAll(amount) { case (i, d) =>
    val es = "%,d".format(i).replace(",", ".") + f",$d%02d"
    LocaleNum.parseString(s"  $es ") == LocaleNum.parseString(es)
  }

  property("parse never returns NaN or Infinity") =
    forAll(Gen.oneOf(Gen.alphaNumStr, Gen.const("NaN"), Gen.const("Infinity"),
      Gen.const("-inf"), amount.map { case (i, d) => s"$i,$d" })) { s =>
      val r = LocaleNum.parseString(s)
      r == null || (!r.isNaN && !r.isInfinite)
    }
}

/** Distributed-operator properties checked on a shared local session. */
class OperatorPropertySpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("property: DedupLatest emits exactly one row per key, the argmax") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(1000), i.toLong)
    }
    val df = rows.toDF("k", "v", "ord")
    val got = graft.operators.DedupLatest(df, Seq("k"),
      Seq(col("v").desc, col("ord").desc))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val expected = rows.groupBy(_._1).map { case (k, g) =>
      k -> g.map(t => (t._2, t._3)).max
    }
    assert(got === expected)
  }

  test("property: UnionByName column set is the union of inputs") {
    val a = Seq((1, "x")).toDF("c1", "c2")
    val b = Seq((2.0, true)).toDF("c3", "c4")
    val c = Seq((5, 6L)).toDF("c1", "c3")
    val u = graft.operators.UnionByName(Seq(a, b, c))
    assert(u.columns.toSet === Set("c1", "c2", "c3", "c4"))
    assert(u.count() === 3)
    // missing columns materialize as null
    assert(u.filter(col("c2").isNull).count() === 2)
  }

  test("property: RangeJoin equals the naive theta join") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "p")
    val iv = (1 to 80).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, lo, lo + rnd.nextInt(500).toLong)
    }.toDF("iid", "lo", "hi")
    val fast = graft.operators.RangeJoin
      .pointInInterval(points, iv, "p", "lo", "hi", blockWidth = 512)
      .select("pid", "iid").collect().map(_.toSeq).toSet
    val naive = points.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(_.toSeq).toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
  }
}
