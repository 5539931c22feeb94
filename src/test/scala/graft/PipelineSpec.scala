package graft

import graft.sources.LayerStore

/** End-to-end twin of the reference's `etl.py --layer all`: one full
  * bronze→silver→gold run on sf0.001 into a temp store, then a second
  * run to prove idempotency (upsert bronze, full-refresh silver/gold,
  * run-scoped forecasts). */
class PipelineSpec extends SparkSpec {

  private lazy val root =
    java.nio.file.Files.createTempDirectory("pipeline_spec").toString
  private lazy val results = Pipeline.run(spark, sf0001, root)
  private lazy val store = new LayerStore(spark, root)

  test("all three layers succeed") {
    assert(results.map(r => r.layer -> r.ok) ==
      Seq("bronze" -> true, "silver" -> true, "gold" -> true))
    assert(results.forall(_.rows > 0))
  }

  test("every layer table exists with rows") {
    results // force the (lazy) pipeline run even when filtered to this test
    val expect = Seq(
      "bronze" -> Seq("orders", "lineitem", "documents", "embeddings"),
      "silver" -> Seq("suppliers", "products", "warehouses", "retail_stores",
        "inventory", "supply_orders", "orders", "lineitem", "quality_issues_log"),
      "gold" -> Seq("monthly_sales", "inventory_health", "supplier_monthly",
        "dashboard", "forecasts", "table_metadata"),
      "audit" -> Seq("rejected_rows", "etl_steps", "dq_results", "etl_log"))
    // rejected_rows may legitimately be empty: sf0.001 bronze is clean
    val mayBeEmpty = Set("audit.rejected_rows")
    for ((layer, tables) <- expect; t <- tables) {
      assert(store.exists(layer, t), s"$layer.$t missing")
      if (!mayBeEmpty(s"$layer.$t"))
        assert(store.table(layer, t).count() > 0, s"$layer.$t empty")
    }
  }

  test("re-run is idempotent where it must be") {
    results // force first run
    val bronzeBefore = store.table("bronze", "lineitem").count()
    val goldBefore = store.table("gold", "monthly_sales").count()
    val second = Pipeline.run(spark, sf0001, root)
    assert(second.forall(_.ok))
    // bronze upserts: same keys -> same cardinality
    assert(store.table("bronze", "lineitem").count() == bronzeBefore)
    // gold full refresh: deterministic -> same cardinality
    assert(store.table("gold", "monthly_sales").count() == goldBefore)
    // forecasts: run-scoped overwrite accumulates one horizon per run id
    val fc = store.table("gold", "forecasts")
    assert(fc.select("run_id").distinct().count() == 2)
    // audit log appends one row per layer per run
    assert(store.table("audit", "etl_log").count() == 6)
  }
}
