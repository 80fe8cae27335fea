package graft

import org.apache.spark.sql.functions._
import graft.functions.SimHash64

/** The single-pass [[SimHash64]] expression must be bit-identical to the
  * SQL-lambda composable form it replaces (per-word xxhash64, +1/-1 bit
  * votes, sign threshold).
  */
class SimHash64Spec extends SparkTestBase {
  import spark.implicits._

  private def composable(textCol: String) = {
    val votes = expr(
      s"""aggregate(
            transform(split(trim($textCol), '\\\\s+'), w -> xxhash64(w)),
            array_repeat(0L, 64),
            (acc, h) -> zip_with(acc,
              transform(sequence(0, 63), i -> IF(((h >> i) & 1) = 1, 1L, -1L)),
              (a, b) -> a + b))""")
    (0 until 64).map { i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("bit-identical to the composable form on the documents corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val diff = docs
      .withColumn("fast", SimHash64(split(trim(col("text")), "\\s+")))
      .withColumn("slow", composable("text"))
      .filter(not(col("fast") <=> col("slow")))
      .count()
    assert(diff === 0L)
  }

  test("edge cases: empty text, null text, repeated words") {
    val df = Seq(Some("hello world hello"), Some(""), None, Some("  a  b  "))
      .toDF("text")
    val diff = df
      .withColumn("fast", SimHash64(split(trim(col("text")), "\\s+")))
      .withColumn("slow", composable("text"))
      .filter(not(col("fast") <=> col("slow")))
      .count()
    assert(diff === 0L)
  }
}
