package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Mmr, Similarity}

/** MMR re-rank vs an in-memory greedy oracle. */
class MmrSpec extends SparkTestBase {
  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val r = d / (math.sqrt(a.map(x => x * x).sum) *
      math.sqrt(b.map(x => x * x).sum))
    math.round(r * 1e4) / 1e4 // mirror round(col, 4) closely enough
  }

  test("mmr equals the in-memory greedy; diversity beats pure top-k") {
    // two tight clusters: A (high rel, near-duplicates) and B (lower
    // rel, orthogonal-ish) — pure top-3 picks all of A; MMR must
    // interleave B
    val pool = Seq(
      (1L, Seq(1.0, 0.0, 0.0), 0.99),
      (2L, Seq(0.999, 0.01, 0.0), 0.98),
      (3L, Seq(0.998, 0.02, 0.0), 0.97),
      (4L, Seq(0.0, 1.0, 0.0), 0.80),
      (5L, Seq(0.0, 0.0, 1.0), 0.75))
    val df = pool.toDF("id", "vec", "rel")
    val got = Mmr.rerank(df, "id", "vec", "rel", k = 3)
      .orderBy("rank").as[(Int, Long, Double)].collect()
    // in-memory greedy with the same 4dp sims
    val byId = pool.map(p => p._1 -> p).toMap
    var sel = List.empty[Long]
    var picks = List.empty[(Long, Double)]
    for (_ <- 1 to 3) {
      val cands = pool.filter(p => !sel.contains(p._1)).map { p =>
        val pen = if (sel.isEmpty) 0.0
          else sel.map(s => cos(p._2, byId(s)._2)).max
        val score = if (sel.isEmpty) 0.5 * p._3
          else 0.5 * p._3 - 0.5 * pen
        (p._1, score)
      }
      val best = cands.minBy { case (id, s) => (-s, id) }
      sel = sel :+ best._1
      picks = picks :+ best
    }
    assert(got.map(_._2).toSeq === picks.map(_._1))
    got.zip(picks).foreach { case ((_, _, s), (_, ws)) =>
      assert(math.abs(s - ws) < 1e-9)
    }
    // the diversity claim itself: rank 2 is NOT the near-duplicate
    assert(got(0)._2 === 1L)
    assert(got(1)._2 != 2L, "rank 2 must not be the near-duplicate")
  }

  test("mmr: k = pool size returns everything, ranks 1..n") {
    val df = Seq((1L, Seq(1.0, 0.0), 0.9), (2L, Seq(0.0, 1.0), 0.8))
      .toDF("id", "vec", "rel")
    val got = Mmr.rerank(df, "id", "vec", "rel", k = 2)
      .orderBy("rank").as[(Int, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq === Seq((1, 1L), (2, 2L)))
  }
}
