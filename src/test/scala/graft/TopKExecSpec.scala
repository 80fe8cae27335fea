package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** The custom TopKPerGroup physical operator: window-form equivalence,
  * the partial→exchange→final plan shape, and the no-sort guarantee. */
class TopKExecSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[4]")
        .appName("graft-topk-exec-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(spark)
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("exec operator keeps exactly the window form's rows") {
    withExtSession { spark =>
      val orders = spark.read
        .parquet("/root/testdata/sf0.001/orders.parquet")
      for (k <- Seq(1, 3, 25)) {
        val got = Analytics.topKPerGroupExec(orders, Seq("o_orderstatus"),
          "o_totalprice", k, Seq("o_orderkey"))
          .select("o_orderstatus", "o_orderkey")
          .orderBy("o_orderstatus", "o_orderkey")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        val want = Analytics.topKPerGroup(orders, Seq("o_orderstatus"),
          "o_totalprice", k, Seq("o_orderkey"))
          .select("o_orderstatus", "o_orderkey")
          .orderBy("o_orderstatus", "o_orderkey")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(got === want, s"k=$k")
      }
    }
  }

  test("plans as partial -> one hash exchange -> final, and never sorts") {
    withExtSession { spark =>
      val orders = spark.read
        .parquet("/root/testdata/sf0.001/orders.parquet")
      val plan = Analytics.topKPerGroupExec(orders, Seq("o_orderstatus"),
        "o_totalprice", 3, Seq("o_orderkey"))
        .queryExecution.executedPlan.toString
      // physical nodes render with the Exec suffix stripped
      assert("TopKPerGroup \\[".r.findAllIn(plan).size === 2,
        s"two phases expected:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
        s"exactly one exchange between the phases:\n$plan")
      assert(!plan.contains("Sort ") && !plan.contains("Window"),
        s"the whole point: no sort, no window:\n$plan")
    }
  }

  test("k larger than every group returns all rows; ties break by id") {
    withExtSession { spark =>
      import spark.implicits._
      val df = Seq(("g", 1L, 10.0), ("g", 3L, 10.0), ("g", 2L, 10.0),
        ("h", 9L, 1.0)).toDF("grp", "id", "v")
      val all = Analytics.topKPerGroupExec(df, Seq("grp"), "v", 100,
        Seq("id")).count()
      assert(all === 4)
      val top2 = Analytics.topKPerGroupExec(df, Seq("grp"), "v", 2,
        Seq("id")).filter(col("grp") === "g")
        .select("id").as[Long].collect().sorted
      assert(top2.toSeq === Seq(1L, 2L), "equal values rank by ascending id")
    }
  }
}
