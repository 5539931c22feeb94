package graft

import graft.operators.GoldMarts
import graft.sources.LayerStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental-refresh contract: recomputing only the delta's
  * months and key-swapping them into the stored mart must equal a
  * from-scratch rebuild over the same silver state. */
class IncrementalMartSpec extends SparkSpec {

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

  test("incremental month refresh equals a full rebuild") {
    val root = java.nio.file.Files.createTempDirectory("inc_mart").toString
    val store = new LayerStore(spark, root)
    assert(Pipeline.runBronze(spark, store, sf0001).ok)
    assert(Pipeline.runSilver(spark, store, "inc-run").ok)
    // initial mart (direct build — the full runGold's forecasting
    // stack is irrelevant to this contract)
    store.write("gold", "monthly_sales",
      GoldMarts.monthlySalesFrom(Pipeline.goldResolver(store), identity))
    // collect eagerly: the refresh below swaps the mart's files, so a
    // lazily-held frame over the old files would fail to re-read
    val beforeRows = rows(store.table("gold", "monthly_sales"))
    val monthsBefore = store.table("gold", "monthly_sales")
      .select("sales_month").distinct().count()

    // delta: extra lineitems on three existing orders (their months'
    // quantities/revenues change; no new months appear)
    val victims = store.table("silver", "lineitem")
      .orderBy("l_orderkey", "l_linenumber").limit(3)
      .withColumn("l_quantity", col("l_quantity") + lit(5.0))
      .withColumn("l_linenumber", col("l_linenumber") + lit(100L))
    // pin the victim keys BEFORE the write swaps the files the
    // `victims` plan reads from
    val victimKeys = victims.select("l_orderkey").distinct()
      .collect().map(_.getLong(0)).toSeq
    store.write("silver", "lineitem",
      store.table("silver", "lineitem").unionByName(victims))
    val deltaOrders = Pipeline.goldResolver(store)("orders")
      .filter(col("o_orderkey").isin(victimKeys: _*))

    val n = Pipeline.refreshMonthlySales(spark, store, deltaOrders)
    assert(n > 0)
    val expected = GoldMarts.monthlySalesFrom(Pipeline.goldResolver(store), identity)
    val got = store.table("gold", "monthly_sales")
    assert(got.count() == expected.count())
    assert(rows(got) == rows(expected),
      "incremental refresh diverged from the full rebuild")
    // the refresh changed the victims' months and ONLY those months
    val monthSet = deltaOrders
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .distinct().collect().map(_.getDate(0)).toSet
    val changed = rows(got) -- beforeRows
    assert(changed.nonEmpty)
    assert(changed.forall(r => monthSet.contains(r.head.asInstanceOf[java.sql.Date])),
      "a month outside the delta changed")
    assert(got.select("sales_month").distinct().count() == monthsBefore)

    // empty delta is a no-op
    val n2 = Pipeline.refreshMonthlySales(spark, store, deltaOrders.limit(0))
    assert(n2 == 0L)
    assert(rows(store.table("gold", "monthly_sales")) == rows(expected))
    store.teardown()
  }

  test("supplier marts and dashboard refresh incrementally == full rebuilds") {
    val root = java.nio.file.Files.createTempDirectory("inc_mart3").toString
    val store = new LayerStore(spark, root)
    assert(Pipeline.runBronze(spark, store, sf0001).ok)
    assert(Pipeline.runSilver(spark, store, "inc-run3").ok)
    val resolve = Pipeline.goldResolver(store)
    store.write("gold", "inventory_health", GoldMarts.inventoryHealthFrom(resolve))
    store.write("gold", "supplier_monthly", GoldMarts.supplierMonthlyFrom(resolve, identity))
    store.write("gold", "dashboard", GoldMarts.dashboardFrom(resolve))
    val invBefore = rows(store.table("gold", "inventory_health"))
    val supBefore = rows(store.table("gold", "supplier_monthly"))

    // pin four victims eagerly (writes below swap the files lazy
    // plans would re-read): three become modified INSERTS under new
    // line numbers, the fourth is DELETED from silver
    val li = store.table("silver", "lineitem")
    val schema = li.schema
    val victims = li.orderBy("l_orderkey", "l_linenumber").limit(4).collect()
    val qi = schema.fieldIndex("l_quantity")
    val lni = schema.fieldIndex("l_linenumber")
    val oki = schema.fieldIndex("l_orderkey")
    val inserts = victims.take(3).map(r => org.apache.spark.sql.Row.fromSeq(
      r.toSeq.updated(qi, r.getDouble(qi) + 5.0).updated(lni, r.getInt(lni) + 100)))
    val delKey = (victims(3).getLong(oki), victims(3).getInt(lni))
    store.write("silver", "lineitem",
      li.filter(!(col("l_orderkey") === delKey._1 && col("l_linenumber") === delKey._2))
        .unionByName(spark.createDataFrame(
          java.util.Arrays.asList(inserts: _*), schema)))
    // the delta: the three new-key rows plus the deleted row's old
    // version (the caller's moved/removed-row contract)
    val delta = spark.createDataFrame(
      java.util.Arrays.asList(inserts :+ victims(3): _*), schema)

    val (nInv, nSup) = Pipeline.refreshSupplierMarts(spark, store, delta)
    val nDash = Pipeline.refreshDashboard(spark, store, delta)
    assert(nInv > 0 && nSup > 0 && nDash > 0)

    val freshResolve = Pipeline.goldResolver(store)
    assert(rows(store.table("gold", "inventory_health")) ==
      rows(GoldMarts.inventoryHealthFrom(freshResolve)),
      "incremental inventory_health diverged from the full rebuild")
    assert(rows(store.table("gold", "supplier_monthly")) ==
      rows(GoldMarts.supplierMonthlyFrom(freshResolve, identity)),
      "incremental supplier_monthly diverged from the full rebuild")
    assert(rows(store.table("gold", "dashboard")) ==
      rows(GoldMarts.dashboardFrom(freshResolve)),
      "incremental dashboard diverged from the full rebuild")

    // the deleted key's dashboard row is GONE
    assert(store.table("gold", "dashboard")
      .filter(col("l_orderkey") === delKey._1 && col("l_linenumber") === delKey._2)
      .isEmpty, "stale dashboard row survived its silver deletion")
    // only the delta's suppliers changed in the supplier-keyed marts
    val deltaSups = delta.select("l_suppkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val invChanged = (rows(store.table("gold", "inventory_health")) -- invBefore) ++
      (invBefore -- rows(store.table("gold", "inventory_health")))
    assert(invChanged.nonEmpty &&
      invChanged.forall(r => deltaSups.contains(r.head.asInstanceOf[Long])),
      "an inventory_health supplier outside the delta changed")
    val supChanged = (rows(store.table("gold", "supplier_monthly")) -- supBefore) ++
      (supBefore -- rows(store.table("gold", "supplier_monthly")))
    assert(supChanged.nonEmpty &&
      supChanged.forall(r => deltaSups.contains(r(1).asInstanceOf[Long])),
      "a supplier_monthly supplier outside the delta changed")

    // empty deltas are no-ops
    assert(Pipeline.refreshSupplierMarts(spark, store, delta.limit(0)) == ((0L, 0L)))
    assert(Pipeline.refreshDashboard(spark, store, delta.limit(0)) == 0L)
    store.teardown()
  }

  test("delta backtest re-scoring + re-selection == full re-score") {
    val root = java.nio.file.Files.createTempDirectory("inc_bt").toString
    val store = new LayerStore(spark, root)
    assert(Pipeline.runBronze(spark, store, sf0001).ok)
    assert(Pipeline.runSilver(spark, store, "inc-bt").ok)
    import graft.operators.Backtest
    val metrics0 = Backtest.metricsOverLevels(store.table("silver", _))
    store.write("gold", "forecast_metrics", metrics0)
    store.write("gold", "model_selection", Backtest.championOver(
      store.table("gold", "forecast_metrics")))
    // collect eagerly: refreshes below swap the files lazy plans read
    val metricsBefore = rows(store.table("gold", "forecast_metrics"))
    val selBefore = rows(store.table("gold", "model_selection"))

    // delta: shift ONE supplier's quantities — its supplier series,
    // its parts' series, and its region's series all move
    val li = store.table("silver", "lineitem")
    val sup = li.select("l_suppkey").orderBy("l_suppkey").limit(1)
      .collect()(0).getLong(0)
    store.write("silver", "lineitem",
      li.withColumn("l_quantity",
        when(col("l_suppkey") === sup, col("l_quantity") + lit(3.0))
          .otherwise(col("l_quantity"))))
    val delta = store.table("silver", "lineitem").filter(col("l_suppkey") === sup)

    val (nM, nS) = Pipeline.refreshModelSelection(spark, store, delta)
    assert(nM > 0 && nS > 0)
    val expectedMetrics = Backtest.metricsOverLevels(store.table("silver", _))
    assert(rows(store.table("gold", "forecast_metrics")) == rows(expectedMetrics),
      "delta re-score diverged from the full re-score")
    assert(rows(store.table("gold", "model_selection")) ==
      rows(Backtest.championOver(expectedMetrics)),
      "delta re-selection diverged from the full re-selection")
    // per-entity model metrics outside the delta must not have moved
    // (global_ar legitimately moves everywhere — pooled coefficients)
    val deltaParts = delta.select("l_partkey").distinct()
      .collect().map(_.getLong(0).toString).toSet
    val metChanged = (rows(store.table("gold", "forecast_metrics")) -- metricsBefore) ++
      (metricsBefore -- rows(store.table("gold", "forecast_metrics")))
    val allowed = (lvl: String, e: String, m: String) => m == "global_ar" || (lvl match {
      case "supplier" => e == sup.toString
      case "product" => deltaParts.contains(e)
      case "region" => true // the supplier's whole region legitimately re-scores
    })
    assert(metChanged.forall(r => allowed(r(1).asInstanceOf[String],
      r(2).asInstanceOf[String], r(3).asInstanceOf[String])),
      s"per-entity metrics outside the delta changed: ${metChanged.take(3)}")
    assert(selBefore.nonEmpty) // sanity: the initial selection existed

    // empty delta is a no-op
    assert(Pipeline.refreshModelSelection(spark, store, delta.limit(0)) == ((0L, 0L)))
    store.teardown()
  }
}
