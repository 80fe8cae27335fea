package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make the native expressions SQL-callable on a
  * session built with the extension — the application-wide injection
  * path (`spark.sql.extensions`). Uses newSession() off the shared
  * context to avoid a second SparkContext.
  */
class ExtensionsRegistrationSpec extends AnyFunSuite {

  test("extension-built session exposes locale_num and dot_product in SQL") {
    // Under the full suite a shared session already exists and getOrCreate
    // would return it WITHOUT applying extensions. Clear the active/default
    // session first (the shared SparkContext is reused — no second JVM
    // context), and restore both afterwards so later suites see theirs.
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = spark.sql(
        """SELECT locale_num('1.234.567,89') AS v,
                  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""")
        .head()
      assert(r.getDouble(0) === 1234567.89)
      assert(r.getDouble(1) === 11.0)
      val r2 = spark.sql(
        """SELECT size(minhash_signature(array('a','b'), 16)) AS sig_len,
                  simhash64(array('hello','world')) AS sh,
                  sorted_jaccard(array(1L,2L,3L), array(2L,3L,4L)) AS j,
                  first_equal_index(array(1L,2L), array(9L,2L)) AS fei""")
        .head()
      val expectedSh = graft.functions.SimHash64(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Seq("hello", "world"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
        .eval(null).asInstanceOf[Long]
      assert(r2.getInt(0) === 16)
      assert(r2.getLong(1) === expectedSh)
      assert(r2.getDouble(2) === 0.5)
      assert(r2.getInt(3) === 1)
      // hardening: sorted_jaccard ignores null elements (array_compact in
      // the builder) instead of misreading them as zeros; first_equal_index
      // rejects nullable-element arrays at analysis (positional semantics,
      // compaction would shift indices); oversized k rejected un-truncated
      val jNull = spark.sql(
        "SELECT sorted_jaccard(array(CAST(NULL AS LONG)), array(0L)) AS j")
        .head().getDouble(0)
      assert(jNull === 0.0) // {} vs {0}
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(
          "SELECT first_equal_index(array(CAST(NULL AS LONG)), array(0L))")
          .head()
      }
      intercept[IllegalArgumentException] {
        spark.sql("SELECT minhash_signature(array('a'), 4294967312)").head()
      }
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
      if (prevActive.isEmpty) SparkSession.clearActiveSession()
      if (prevDefault.isEmpty) SparkSession.clearDefaultSession()
    }
  }

  // Note: the `spark.sql.extensions` CONFIG-string route cannot be
  // exercised under the shared test context — getOrCreate resolves that
  // static conf from the SparkContext created by the first suite, not
  // from the builder options. The withExtensions test above drives the
  // same applyExtensions path the config route uses.
}
