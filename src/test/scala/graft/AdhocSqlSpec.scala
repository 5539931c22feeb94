package graft

import graft.sources.LayerStore
import org.apache.spark.sql.functions._

/** The reference Query Runner's four sample queries
  * (/root/reference/app.py:1344-1356), VERBATIM — including the
  * Postgres schema prefixes and trailing semicolons — through
  * LayerStore.adhocSql against a real bronze→silver run. Each result
  * is cross-checked against an independent DataFrame-API twin of the
  * same query, so the SQL-text surface and the API surface must agree
  * row for row. */
class AdhocSqlSpec extends SparkSpec {

  private lazy val store: LayerStore = {
    val root = java.nio.file.Files.createTempDirectory("adhoc_sql_spec").toString
    val s = new LayerStore(spark, root)
    assert(Pipeline.runBronze(spark, s, sf0001).ok)
    assert(Pipeline.runSilver(spark, s, "adhoc-spec-run").ok)
    s
  }

  // app.py:1344-1356, character for character
  private val selectAllOrders = "SELECT * FROM silver.supply_orders LIMIT 10;"
  private val ordersByStatus =
    "SELECT status, COUNT(*) FROM silver.supply_orders GROUP BY status;"
  private val revenueByProduct =
    """SELECT p.product_name, SUM(so.total_invoice) as revenue
FROM silver.products p
JOIN silver.supply_orders so ON p.product_id = so.product_id
GROUP BY p.product_name ORDER BY revenue DESC;"""
  private val lowStockItems =
    """SELECT p.product_name, w.warehouse_name, i.quantity_on_hand
FROM silver.inventory i
JOIN silver.products p ON i.product_id = p.product_id
JOIN silver.warehouses w ON i.warehouse_id = w.warehouse_id
WHERE i.quantity_on_hand <= 50;"""

  test("sample 1: Select all orders — LIMIT 10 rows of the full entity") {
    val out = store.adhocSql(selectAllOrders)
    assert(out.count() == 10)
    assert(out.columns.toSeq == store.table("silver", "supply_orders").columns.toSeq)
  }

  test("sample 2: Orders by status — agrees with the API twin") {
    val sqlRows = store.adhocSql(ordersByStatus)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val apiRows = store.table("silver", "supply_orders")
      .groupBy(col("status")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sqlRows == apiRows)
    assert(sqlRows.nonEmpty && sqlRows.values.sum ==
      store.table("silver", "supply_orders").count())
  }

  test("sample 3: Revenue by product — agrees with the API twin") {
    // compare on cents (the SQL and API plans may fold doubles in
    // different orders; the underlying values are 2-dp money)
    def toCents(d: Double): Long = math.round(d * 100)
    val sqlRows = store.adhocSql(revenueByProduct)
      .collect().map(r => r.getString(0) -> toCents(r.getDouble(1))).toMap
    val apiRows = store.table("silver", "products").select(col("product_id"), col("product_name"))
      .join(store.table("silver", "supply_orders"), "product_id")
      .groupBy(col("product_name"))
      .agg(sum(col("total_invoice")).as("revenue"))
      .collect().map(r => r.getString(0) -> toCents(r.getDouble(1))).toMap
    assert(sqlRows == apiRows)
    assert(sqlRows.nonEmpty)
  }

  test("sample 4: Low stock items — agrees with the API twin") {
    val out = store.adhocSql(lowStockItems)
    val apiCount = store.table("silver", "inventory")
      .filter(col("quantity_on_hand") <= 50)
      .join(store.table("silver", "products"), "product_id")
      .join(store.table("silver", "warehouses"), "warehouse_id")
      .count()
    assert(out.count() == apiCount)
    assert(out.columns.toSeq ==
      Seq("product_name", "warehouse_name", "quantity_on_hand"))
    // every returned row honors the predicate
    assert(out.filter(col("quantity_on_hand") > 50).count() == 0)
  }
}
