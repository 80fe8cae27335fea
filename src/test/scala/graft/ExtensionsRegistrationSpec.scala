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
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT locale_num('1.234.567,89') AS v,
                  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""")
        .head()
      assert(r.getDouble(0) === 1234567.89)
      assert(r.getDouble(1) === 11.0)
    } finally {
      // keep the shared context alive for other suites; just drop the view state
    }
  }
}
