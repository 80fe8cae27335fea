package graft

import org.apache.spark.sql.functions._
import graft.operators.Moments

/** Round-13k pins: moment identities on hand distributions and parity
  * with Spark's built-in population skewness/kurtosis. */
class Round13kSpec extends SparkTestBase {
  import spark.implicits._

  test("Moments: symmetric -> skew 0; two-point -> kurtosis -2") {
    val r = Moments.shape(
      Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
        ("b", -1.0), ("b", 1.0)).toDF("k", "v"),
      col("k"), col("v")).orderBy("key").collect()
    assert(r(0).getDouble(3) === 0.0) // symmetric
    assert(r(1).getDouble(3) === 0.0 && r(1).getDouble(4) === -2.0)
  }

  test("Moments: constant and single-row groups hit the m2 guard") {
    val r = Moments.shape(
      Seq(("c", 5.0), ("c", 5.0), ("d", 7.0)).toDF("k", "v"),
      col("k"), col("v")).orderBy("key").collect()
    assert(r.forall(row => row.getDouble(3) === 0.0 &&
      row.getDouble(4) === 0.0))
  }

  test("Moments match Spark's built-in population moments on real data") {
    val ev = queries.tbl(spark, sf, "events")
      .where(col("event_type").isNotNull && col("value").isNotNull)
    val got = Moments.shape(ev, col("event_type"), col("value"))
      .orderBy("key").collect()
    val want = ev.groupBy("event_type")
      .agg(skewness("value").as("sk"), kurtosis("value").as("ku"))
      .orderBy("event_type").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g.getDouble(3) - w.getDouble(1)) < 1e-3,
        s"skewness ${g.getString(0)}")
      assert(math.abs(g.getDouble(4) - w.getDouble(2)) < 1e-3,
        s"kurtosis ${g.getString(0)}")
    }
  }
}
