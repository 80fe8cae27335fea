package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct
import graft.similarity.Similarity

class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  test("native dot product equals the higher-order-function fold bit-for-bit") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", Similarity.toVec($"embedding").as("v"))
    val q = emb.filter($"vec_id" === 0).select($"v".as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      $"vec_id",
      DotProduct.dot($"v", $"qv").as("native"),
      Similarity.dotHof($"v", $"qv").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() === 0) // exact equality
  }

  test("null and edge semantics") {
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (2L, None, Some(Seq(1.0))),
      (3L, Some(Seq.empty[Double]), Some(Seq.empty[Double]))
    ).toDF("id", "a", "b")
    val got = df.select($"id", DotProduct.dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L) === Some(11.0))
    assert(got(2L) === None) // null array -> null
    assert(got(3L) === Some(0.0))
  }

  test("VectorCentroid aggregator: elementwise mean with partial merge") {
    val ds = Seq(
      (0, Seq(1.0, 10.0)), (0, Seq(3.0, 30.0)), (1, Seq(5.0, 7.0))
    ).toDS()
    val agg = new graft.similarity.VectorCentroid(2).toColumn.name("c")
    val got = ds.groupByKey(_._1).mapValues(_._2).agg(agg)
      .collect().toMap
    assert(got(0) === Seq(2.0, 20.0))
    assert(got(1) === Seq(5.0, 7.0))
  }

  test("stays inside whole-stage codegen") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(Similarity.toVec($"embedding").as("v"))
    val df = emb.select(DotProduct.dot($"v", $"v").as("d"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
  }
}
