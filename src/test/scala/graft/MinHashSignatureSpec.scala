package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashSignature

/** The single-pass [[MinHashSignature]] expression must be bit-identical
  * to the composable form it replaces —
  * `array((0 until k).map(i => array_min(transform(sh, x => xxhash64(x, lit(i))))))`
  * — so LSH candidate sets (and the r01 gate-query row counts) are
  * unchanged. Verified on the real documents table and on edge-case
  * literals (empty array, null array, null element).
  */
class MinHashSignatureSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 64

  private def composable(sh: org.apache.spark.sql.Column) =
    array((0 until k).map { i =>
      array_min(transform(sh, x => xxhash64(x, lit(i))))
    }: _*)

  test("bit-identical to the composable form on the documents corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("__sh", array_distinct(split(trim(col("text")), "\\s+")))
    val diff = docs
      .withColumn("fast", MinHashSignature.signature(col("__sh"), k))
      .withColumn("slow", composable(col("__sh")))
      .filter(not(col("fast") <=> col("slow")))
      .count()
    assert(diff === 0L)
  }

  test("edge cases: empty array, null array, null element") {
    val df = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]]),
      (4L, Seq("a", null, "c"))
    ).toDF("id", "sh")
    val diff = df
      .withColumn("fast", MinHashSignature.signature(col("sh"), k))
      .withColumn("slow", composable(col("sh")))
      .filter(not(col("fast") <=> col("slow")))
      .count()
    assert(diff === 0L)
  }

  test("SortedJaccard on hashed sets equals exact string-set jaccard") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
      .select(col("doc_id"),
        array_distinct(split(trim(col("text")), "\\s+")).as("__set"))
      .withColumn("__hset", array_sort(transform(col("__set"), w => xxhash64(w))))
    val a = docs.toDF("id_a", "set_a", "h_a")
    val b = docs.toDF("id_b", "set_b", "h_b")
    val pairs = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("fast", graft.functions.SortedJaccard(col("h_a"), col("h_b")))
      .withColumn("exact",
        size(array_intersect(col("set_a"), col("set_b"))).cast("double")
          / size(array_union(col("set_a"), col("set_b"))))
    assert(pairs.filter(abs(col("fast") - col("exact")) > 1e-12).count() === 0L)
  }

  test("FirstEqualIndex finds the first colliding slot") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(9L, 2L, 3L), 1),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 0),
      (Seq(1L, 2L, 3L), Seq(7L, 8L, 9L), -1)
    ).toDF("a", "b", "expected")
    assert(df.filter(
      graft.functions.FirstEqualIndex(col("a"), col("b")) =!= col("expected"))
      .count() === 0L)
  }

  test("survives both codegen and interpreted evaluation") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      Seq("CODEGEN_ONLY", "NO_CODEGEN").foreach { mode =>
        spark.conf.set("spark.sql.codegen.factoryMode", mode)
        val r = Seq(Tuple1(Seq("x", "y", "z"))).toDF("sh")
          .select(MinHashSignature.signature(col("sh"), 8).as("sig"))
          .head().getSeq[Long](0)
        assert(r.length === 8)
      }
    } finally {
      prev.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }
}
