package graft

/** Every SparkEntry query must run green on sf0.001 and return rows.
  * (Hash correctness against DuckDB is the driver's t2 gate; this catches
  * runtime errors and empty results early.)
  */
class QueriesSmokeSpec extends SparkTestBase {
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows on sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query with an oracle has a query impl") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
