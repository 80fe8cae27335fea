package graft

import org.apache.spark.sql.functions._
import graft.operators.LanedPrefix

/** The shared two-level prefix helper vs brute-force prefix sums —
  * three operators (KS, percent-rank, AUC) ride on this. */
class LanedPrefixSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextDouble() * 100, rnd.nextInt(5) + 1L,
      rnd.nextInt(3).toLong))
      .groupBy(_._1).map { case (v, rows) =>
        (v, rows.map(_._2).sum, rows.map(_._3).sum)
      }.toSeq
  }

  test("inclusive and exclusive prefixes match brute force, any lanes") {
    val rows = fixture(2000, 83)
    val df = rows.toDF("v", "a", "b")
    val sorted = rows.sortBy(_._1)
    val cumA = sorted.scanLeft(0L)(_ + _._2).tail
    val cumB = sorted.scanLeft(0L)(_ + _._3).tail
    for (nLanes <- Seq(2, 7, 32); inclusive <- Seq(true, false)) {
      val (out, totals) = LanedPrefix.withPrefix(df, "v",
        Seq("a", "b"), k = 512, nLanes = nLanes, inclusive = inclusive)
      val got = out.select("v", "a_cum", "b_cum")
        .as[(Double, Long, Long)].collect().sortBy(_._1)
      val shift = if (inclusive) 0 else 1
      sorted.zipWithIndex.foreach { case ((v, _, _), i) =>
        val wantA = if (i - shift < 0) 0L else cumA(i - shift)
        val wantB = if (i - shift < 0) 0L else cumB(i - shift)
        assert(got(i) === ((v, wantA, wantB)),
          s"lanes=$nLanes inclusive=$inclusive row $i")
      }
      val t = totals.as[(Long, Long)].head()
      assert(t === ((rows.map(_._2).sum, rows.map(_._3).sum)))
    }
  }

  test("single-row and empty inputs") {
    val one = Seq((5.0, 3L)).toDF("v", "c")
    val (o1, t1) = LanedPrefix.withPrefix(one, "v", Seq("c"),
      k = 8, nLanes = 2, inclusive = false)
    assert(o1.select("c_cum").as[Long].head() === 0L)
    assert(t1.as[Long].head() === 3L)
    val (o1i, _) = LanedPrefix.withPrefix(one, "v", Seq("c"),
      k = 8, nLanes = 2, inclusive = true)
    assert(o1i.select("c_cum").as[Long].head() === 3L)
    val none = one.where(lit(false))
    val (o0, _) = LanedPrefix.withPrefix(none, "v", Seq("c"),
      k = 8, nLanes = 2, inclusive = true)
    assert(o0.count() === 0)
  }

  test("grouped prefixes match per-group brute force, any lanes") {
    val rnd = new scala.util.Random(101)
    val rows = Seq.fill(3000)((s"g${rnd.nextInt(4)}",
        rnd.nextDouble() * 50, rnd.nextInt(5) + 1L))
      .groupBy(r => (r._1, r._2)).map { case ((g, v), rs) =>
        (g, v, rs.map(_._3).sum)
      }.toSeq
    val df = rows.toDF("g", "v", "c")
    val brute = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      val cum = sorted.scanLeft(0L)(_ + _._3)
      sorted.zipWithIndex.map { case ((_, v, _), i) =>
        ((g, v), (cum(i), cum(i + 1))) // (exclusive, inclusive)
      }
    }.toMap
    for (nLanes <- Seq(2, 8); inclusive <- Seq(true, false)) {
      val (out, totals) = LanedPrefix.withPrefixGrouped(df, "g", "v",
        Seq("c"), k = 256, nLanes = nLanes, inclusive = inclusive)
      out.select("g", "v", "c_cum").as[(String, Double, Long)]
        .collect().foreach { case (g, v, cum) =>
          val want =
            if (inclusive) brute((g, v))._2 else brute((g, v))._1
          assert(cum === want, s"g=$g v=$v lanes=$nLanes inc=$inclusive")
        }
      val t = totals.as[(String, Long)].collect().toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        assert(t(g) === rs.map(_._3).sum, s"totals for $g")
      }
    }
  }
}
