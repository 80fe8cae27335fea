package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order clustering: Morton-code unit properties, the layout plan
  * shape, and the point of it all — every clustered column's per-file
  * value range tightens versus a single-column sort. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave: corners, bit placement, monotone along each axis") {
    val df = Seq((0L, 0L), (15L, 15L), (1L, 0L), (0L, 1L), (15L, 0L))
      .toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 4).as("z"))
    val zs = df.collect().map(_.getLong(0)).toSeq
    assert(zs(0) === 0L)
    assert(zs(1) === 255L) // all 8 bits set
    assert(zs(2) === 1L)   // x contributes the even bits
    assert(zs(3) === 2L)   // y contributes the odd bits
    assert(zs(4) === 85L)  // 01010101: x=15, y=0
    // monotone in x at fixed y=0
    val xs = (0L until 16L).map(x => Seq((x, 0L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 4)).head().getLong(0))
    assert(xs === xs.sorted)
  }

  test("deinterleave round-trips every rank pair") {
    val pairs = spark.range(256).select(
      (col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
    val z = pairs.select(col("x"), col("y"),
      ZOrder.interleave(Seq(col("x"), col("y")), 4).as("z"))
    val bad = z.filter(
      ZOrder.deinterleave(col("z"), 0, 2, 4) =!= col("x") ||
        ZOrder.deinterleave(col("z"), 1, 2, 4) =!= col("y")).count()
    assert(bad === 0L)
    // and the code is a bijection on the 8-bit space
    assert(z.select("z").distinct().count() === 256L)
  }

  test("clustered layout plans a range exchange on the z-value") {
    val o = queries.tbl(spark, sf, "orders")
    val plan = ZOrder.clustered(o, Seq("o_totalprice", "o_custkey"),
      bits = 4, numFiles = 8).queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(__z"),
      s"layout must range-partition on the z-value:\n$plan")
  }

  test("z-layout tightens the second column's per-file range vs single sort") {
    val o = queries.tbl(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice", "o_custkey")
    def avgSpanByPartition(df: org.apache.spark.sql.DataFrame): Double =
      df.withColumn("__p", spark_partition_id())
        .groupBy("__p")
        .agg((max("o_custkey") - min("o_custkey")).as("span"))
        .agg(avg("span")).head().getDouble(0)
    val zed = avgSpanByPartition(
      ZOrder.clustered(o, Seq("o_totalprice", "o_custkey"), 4, numFiles = 8))
    val single = avgSpanByPartition(
      o.repartitionByRange(8, col("o_totalprice"))
        .sortWithinPartitions("o_totalprice"))
    // a price-sorted layout leaves each file covering ~the full customer
    // space; the z-layout's files cover a fraction of it
    assert(zed < single * 0.8,
      s"z-layout custkey span $zed not tighter than single-sort $single")
  }
}
