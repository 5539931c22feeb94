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

  test("every query has oracle SQL (or is a declared rows-only op)") {
    // q29: DuckDB 1.0 has no list-fold primitive to mirror a full-text
    // rolling hash; value-pinned against an independent impl instead
    // (PolyHashSpec) -> driver records the weaker rows-only check.
    val rowsOnly = Set("q29_poly_fingerprint")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
