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
        "inventory", "supply_orders", "orders", "lineitem", "quality_issues_log",
        "part", "customer", "supplier", "nation", "region"),
      "gold" -> Seq("monthly_sales", "inventory_health", "supplier_monthly",
        "dashboard", "forecasts", "forecast_metrics", "model_selection",
        "table_metadata"),
      "audit" -> Seq("rejected_rows", "etl_steps", "dq_results", "etl_log"))
    // rejected_rows may legitimately be empty: sf0.001 bronze is clean
    val mayBeEmpty = Set("audit.rejected_rows")
    for ((layer, tables) <- expect; t <- tables) {
      assert(store.exists(layer, t), s"$layer.$t missing")
      if (!mayBeEmpty(s"$layer.$t"))
        assert(store.table(layer, t).count() > 0, s"$layer.$t empty")
    }
  }

  test("gold derives from silver: silver-rejected rows are absent from gold") {
    import org.apache.spark.sql.functions._
    val root2 = java.nio.file.Files.createTempDirectory("pipeline_lineage").toString
    val store2 = new LayerStore(spark, root2)
    assert(Pipeline.runBronze(spark, store2, sf0001).ok)
    // poison bronze AFTER the load: a lineitem with non-positive
    // quantity, an order with a negative total price (both silver
    // reject rules), and a VALID lineitem referencing the bad order
    val li = store2.table("bronze", "lineitem")
    val badLi = li.limit(1)
      .withColumn("l_orderkey", lit(999999999L))
      .withColumn("l_quantity", lit(-5.0))
    store2.write("bronze", "lineitem", li.unionByName(badLi))
    val o = store2.table("bronze", "orders")
    val badOrder = o.limit(1)
      .withColumn("o_orderkey", lit(888888888L))
      .withColumn("o_totalprice", lit(-10.0))
    store2.write("bronze", "orders", o.unionByName(badOrder))
    val orphanLi = store2.table("bronze", "lineitem").limit(1)
      .withColumn("l_orderkey", lit(888888888L))
      .withColumn("l_quantity", lit(7.0))
    store2.write("bronze", "lineitem",
      store2.table("bronze", "lineitem").unionByName(orphanLi))
    assert(Pipeline.runSilver(spark, store2, "lineage-run").ok)
    assert(Pipeline.runGold(spark, store2, "lineage-run").ok)
    // present in bronze, rejected by silver…
    assert(store2.table("bronze", "lineitem").filter(col("l_orderkey") === 999999999L).count() == 1)
    assert(store2.table("silver", "lineitem").filter(col("l_orderkey") === 999999999L).count() == 0)
    assert(store2.table("silver", "orders").filter(col("o_orderkey") === 888888888L).count() == 0)
    // …and therefore provably absent from gold built on silver
    assert(store2.table("gold", "dashboard").filter(col("l_orderkey") === 999999999L).count() == 0)
    // the valid lineitem of the rejected order survives the LEFT star
    // but carries no order attributes — its order came from silver,
    // not raw bronze
    val orphan = store2.table("gold", "dashboard").filter(col("l_orderkey") === 888888888L)
    assert(orphan.count() == 1)
    assert(orphan.filter(col("order_date").isNull && col("order_status").isNull).count() == 1)
    // the inner-join marts exclude the rejected order entirely
    assert(store2.table("gold", "monthly_sales").count() > 0)
    // model dispatch through the pipeline: gold built with global_ar
    // above; re-running with another model swaps this run's forecasts
    // through the run-scoped overwrite
    assert(store2.table("gold", "forecasts").select("model").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("global_ar"))
    // every forecasting level in the one gold write, like the
    // reference's run_parallel_forecasts (forecasting.py:339-352)
    assert(store2.table("gold", "forecasts").select("level").distinct()
      .collect().map(_.getString(0)).toSet ==
      graft.operators.Forecasting.levels.toSet)
    assert(Pipeline.runGold(spark, store2, "lineage-run", "linear", "weekly").ok)
    assert(store2.table("gold", "forecasts").select("model").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("linear"))
    assert(store2.table("gold", "forecasts").select("level").distinct()
      .count() == graft.operators.Forecasting.levels.size)
    // the backtest table scores EVERY model x granularity x level —
    // whatever single model the run selected — so a user can choose
    // the next run's model from measured numbers
    val metrics = store2.table("gold", "forecast_metrics")
    assert(metrics.select("model").distinct().collect().map(_.getString(0)).toSet ==
      Set("linear", "seasonal_naive", "seasonal_trend", "global_ar"))
    assert(metrics.select("granularity").distinct().collect().map(_.getString(0)).toSet ==
      Set("daily", "weekly"))
    assert(metrics.select("level").distinct().collect().map(_.getString(0)).toSet ==
      graft.operators.Forecasting.levels.toSet)
    // metric sanity: counts positive, sMAPE within its [0, 200] range
    import org.apache.spark.sql.functions.col
    assert(metrics.filter(col("n") <= 0 || col("smape") < 0 || col("smape") > 200
      || col("mae") < 0).count() == 0)
    // the selection table picks exactly one champion per scored series,
    // and the champion's sMAPE is the minimum the backtest measured
    val sel = store2.table("gold", "model_selection")
    assert(sel.count() ==
      metrics.select("granularity", "level", "entity_id").distinct().count())
    val worseThanChampion = sel.as("s").join(metrics.as("m"),
      Seq("granularity", "level", "entity_id"))
      .filter(col("m.smape") < col("s.smape"))
    assert(worseThanChampion.count() == 0)
    store2.teardown()
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
