package graft

import org.apache.spark.sql.functions._
import graft.graph.KCore
import graft.operators.{Benford, Holt}

/** Round-13i semantic pins: k-core peel order/fixpoint, Benford digit
  * extraction edges, and the Holt fold against a local replay. */
class Round13iSpec extends SparkTestBase {
  import spark.implicits._

  test("KCore: pendant peels, triangle survives at k=2") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val core = KCore.peel(e, "a", "b", k = 2, rounds = 5)
      .orderBy("node").collect()
    assert(core.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("KCore: chained peeling — removing one node cascades") {
    // path 1-2-3-4-5: k=2 kills the endpoints, then everything
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(KCore.peel(e, "a", "b", 2, 10).count() === 0)
    // but only the endpoints die with a single round
    val one = KCore.peel(e, "a", "b", 2, 1).orderBy("node").collect()
    assert(one.map(_.getLong(0)).toSeq === Seq(2L, 3L, 4L))
  }

  test("KCore: k above max degree empties the graph") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(KCore.peel(e, "a", "b", 5, 3).count() === 0)
  }

  test("Benford: integer-cents digit extraction, positives only") {
    val df = Seq(123.45, 0.02, 999.0, -5.0, 0.0).toDF("v")
    val got = Benford.firstDigit(df, col("v")).orderBy("digit")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq === Seq((1, 1L), (2, 1L), (9, 1L)))
    val shares = Benford.firstDigit(df, col("v")).collect()
      .map(_.getDouble(2))
    // shares are floor-rounded at 1e-6, so the sum is 1 up to 9 ulps
    // of that grid (3 x 0.333333 = 0.999999)
    assert(math.abs(shares.sum - 1.0) < 1e-5)
  }

  test("Holt: constant series -> level = x, trend = 0") {
    val df = (0 until 10).map(t => ("k", t.toLong)).toDF("k", "t")
    val r = Holt.linear(df, col("k"), col("t")).head()
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 0.0 &&
      r.getDouble(4) === 1.0)
  }

  test("Holt: engine fold matches a local replay of the recurrence") {
    // counts 1,2,3,...,8 per period (t repeated t+1 times)
    val rows = (0 until 8).flatMap(t => Seq.fill(t + 1)(("k", t.toLong)))
    val got = Holt.linear(rows.toDF("k", "t"), col("k"), col("t"))
      .head()
    var l = 1.0; var b = 0.0
    (2 to 8).foreach { x =>
      val l2 = Holt.Alpha * x + (1 - Holt.Alpha) * (l + b)
      b = Holt.Beta * (l2 - l) + (1 - Holt.Beta) * b
      l = l2
    }
    assert(got.getDouble(2) === math.floor(l * 1e6 + 0.5) / 1e6)
    assert(got.getDouble(3) === math.floor(b * 1e6 + 0.5) / 1e6)
    assert(got.getDouble(3) > 0.0, "increasing series has positive trend")
  }
}
