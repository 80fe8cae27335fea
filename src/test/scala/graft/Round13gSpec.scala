package graft

import org.apache.spark.sql.functions._
import graft.operators.Cusum
import graft.graph.NeighborJaccard

/** Round-13g semantic pins: CUSUM finds a planted level shift at the
  * shift boundary, the σ=0 guard, and neighbor-Jaccard's exact values
  * and duplicate-edge immunity. */
class Round13gSpec extends SparkTestBase {
  import spark.implicits._

  /** One row per event: `c(t)` events at period t. */
  private def seriesDf(counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, t) =>
      Seq.fill(c)(("k", t.toLong))
    }.toDF("k", "t")

  test("Cusum: a level shift peaks |cusum| at the last pre-shift period") {
    // 10 days at 10/day then 10 days at 30/day; mean 20, so the cusum
    // walks to its most negative point exactly at t=9
    val df = seriesDf(Seq.fill(10)(10) ++ Seq.fill(10)(30))
    val cp = Cusum.changepoint(df, col("k"), col("t")).head()
    assert(cp.getLong(1) === 20L && cp.getLong(2) === 9L)
    assert(cp.getDouble(3) < 0.0)
    // and the series is zero-sum at the end (cusum_n = (S_n - n*mu)/sigma = 0)
    val last = Cusum.series(df, col("k"), col("t"))
      .orderBy(col("t").desc).head()
    assert(last.getDouble(3) === 0.0)
  }

  test("Cusum: constant series scores 0 everywhere (sigma=0 guard)") {
    val df = seriesDf(Seq.fill(8)(5))
    val ser = Cusum.series(df, col("k"), col("t")).collect()
    assert(ser.length === 8 && ser.forall(_.getDouble(3) === 0.0))
    val cp = Cusum.changepoint(df, col("k"), col("t")).head()
    // all-tie -> earliest period wins
    assert(cp.getLong(2) === 0L)
  }

  test("NeighborJaccard: exact values on a hand graph") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = NeighborJaccard.pairs(e, "a", "b")
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, 2L, 1L, floor(1.0 / 3)), (1L, 3L, 1L, 0.25),
      (1L, 4L, 1L, 0.5), (2L, 3L, 1L, 0.25), (2L, 4L, 1L, 0.5)))
  }

  private def floor(x: Double): Double =
    math.floor(x * 1e6 + 0.5) / 1e6

  test("NeighborJaccard: duplicate and reversed edges don't double-count") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 3L)).toDF("a", "b")
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = NeighborJaccard.pairs(e, "a", "b")
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    val want = NeighborJaccard.pairs(base, "a", "b")
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  test("NeighborJaccard: self-loops are dropped") {
    val e = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("a", "b")
    val got = NeighborJaccard.pairs(e, "a", "b").collect()
    assert(got.length === 1) // only (2,3) through 1
    assert(got.head.getLong(0) === 2L && got.head.getLong(1) === 3L)
  }
}
