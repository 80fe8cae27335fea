package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Pins the codegen [[graft.functions.RollingFingerprint]] kernel to the
  * SQL-lambda form it replaced (`aggregate(split(c,''), 0L, ...)`) — the
  * same native-vs-composable contract as `DotProductSpec` and
  * `SimHash64Spec`. */
class FingerprintSpec extends SparkTestBase {

  test("codegen fingerprint matches the SQL-lambda form on the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val both = docs.select(
      GraftFunctions.rollingFingerprint(col("text")).as("fast"),
      GraftFunctions.rollingFingerprintHof(col("text")).as("slow"))
    assert(both.filter(!(col("fast") <=> col("slow"))).count() === 0L)
    assert(both.filter(col("fast") > 0).count() > 0, "corpus must exercise it")
  }

  test("edge semantics: empty, null, multibyte code points") {
    import spark.implicits._
    val cases = Seq("", "a", "abc def", "áéí", "ñandú ü", "naïve café",
      "mix a1 ñ z").toDF("s")
      .union(Seq.empty[String].toDF("s"))
      .unionAll(spark.sql("SELECT CAST(NULL AS STRING)"))
    val both = cases.select(col("s"),
      GraftFunctions.rollingFingerprint(col("s")).as("fast"),
      GraftFunctions.rollingFingerprintHof(col("s")).as("slow"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"mismatch for ${r.get(0)}: fast=${r.get(1)} slow=${r.get(2)}")
    }
    // null in, null out; empty string -> 0 (split('') = [''], ascii('')=0)
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(rows.exists(r => "" == r.getString(0) && r.getLong(1) == 0L))
  }
}
