package graft

/** Every registered query runs on sf0.001, returns rows, and has an
  * oracle (or is explicitly listed as rows-only). */
class QuerySmokeSpec extends SparkSpec {

  test("all queries return rows on sf0.001") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    for ((name, fn) <- qs) {
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has oracle SQL") {
    // no rows-only exemptions left: even the full-text rolling hash
    // has a DuckDB twin (HUGEINT mod-2^64 fold, re-signed at the edge)
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
