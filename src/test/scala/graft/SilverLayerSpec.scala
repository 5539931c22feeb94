package graft

import graft.operators.SilverLayer
import org.apache.spark.sql.functions._

/** Unit semantics of the six-entity silver builders: essential-field
  * rejection with full-record JSON payloads, business-rule flagging,
  * quality scoring, and the issues log — on tiny frames where every
  * branch is reachable (the pipeline test covers the clean-data
  * path). */
class SilverLayerSpec extends SparkSpec {
  import spark.implicits._

  test("suppliers: rejection carries the original record as JSON") {
    val bronze = Seq(
      (1L, "  ACME CORP  ", "A@B.com", "(555) 123-4567x"),
      (2L, "!!!", "bad", "12")) // name cleans to NULL -> rejected
      .toDF("supplier_id", "supplier_name", "contact_email", "phone_number")
    val r = SilverLayer.suppliers(bronze)
    assert(r.clean.count() == 1)
    val row = r.clean.head()
    assert(row.getString(1) == "Acme Corp") // collapse + title-case
    assert(row.getString(2) == "a@b.com")   // lowercased valid email
    val rej = r.rejected.head()
    assert(rej.getString(0) == "suppliers")
    assert(rej.getString(1).contains("\"supplier_name\":\"!!!\""))
    assert(rej.getString(2) == "Missing supplier name")
  }

  test("products: cost>price flagged, margin zero-guard, 6-field score") {
    val bronze = Seq(
      (1L, "Widget", "5.00", "10.00", "Tools > Hand", "active"),
      (2L, "Gadget", "20.00", "10.00", "N/A", "inactive"), // cost > price
      (3L, "NoPrice", "1.00", "N/A", "x", "active"))       // rejected
      .toDF("product_id", "product_name", "unit_cost", "selling_price",
        "product_category", "status")
    val r = SilverLayer.products(bronze)
    assert(r.clean.count() == 2)
    val byId = r.clean.collect().map(x => x.getLong(0) -> x).toMap
    assert(byId(1L).getAs[Double]("price_margin") == 5.0)
    assert(byId(1L).getAs[String]("main_category") == "Tools")
    assert(byId(1L).getAs[String]("sub_category") == "Hand")
    // reference quirk (silver_builder.py:656-659): a parseable category
    // (main != 'Uncategorized') counts as an issue on an otherwise-clean row
    assert(byId(1L).getAs[Double]("quality_score") == 83.33)
    assert(byId(2L).getAs[String]("status") == "discontinued")
    assert(byId(2L).getAs[String]("main_category") == "Uncategorized")
    // row 2: status fix + cost>price + category ('N/A' cleans to
    // 'Uncategorized' != raw) -> 3 issues over 6
    assert(byId(2L).getAs[Double]("quality_score") == 50.0)
    // flagged business-rule issue present in the log
    assert(r.issues.filter(col("issue_type") === "cost_higher_than_price")
      .select("record_id").as[Long].collect().toSeq == Seq(2L))
    assert(r.rejected.count() == 1)
  }

  test("supply_orders: calc + date validations drive flags and score") {
    val base = ("1", "2", "3", "5", "10.00", "2020-01-01", "2020-01-05", "2020-01-08")
    val bronze = Seq(
      // correct: invoice = qty * price
      (1L, base._1, base._2, base._3, base._4, base._5, "50.00", base._6, base._7, base._8, "Completed"),
      // calc mismatch: invoice off by > 0.01
      (2L, base._1, base._2, base._3, base._4, base._5, "51.00", base._6, base._7, base._8, "In Transit"),
      // date logic broken: shipped before ordered
      (3L, base._1, base._2, base._3, base._4, base._5, "50.00", "2020-02-01", "2020-01-05", "2020-01-08", "Pending"),
      // rejected: negative quantity cleans to 5 (sign-drop quirk) but
      // NULL order date rejects
      (4L, base._1, base._2, base._3, base._4, base._5, "50.00", "TBD", base._7, base._8, "x"),
      // calc + ship-late at once: each must get its own issues-log row
      (5L, base._1, base._2, base._3, base._4, base._5, "51.00", "2020-02-01", "2020-01-05", "2020-01-08", "Pending"),
      // BOTH date violations: shipped<ordered AND delivered<shipped ->
      // TWO deductions (silver_builder.py:975-985), one combined boolean
      (6L, base._1, base._2, base._3, base._4, base._5, "50.00", "2020-02-01", "2020-01-05", "2020-01-01", "Pending"),
      // invoice 0 is falsy -> calculation check skipped (stays correct)
      (7L, base._1, base._2, base._3, base._4, base._5, "0.00", base._6, base._7, base._8, "Completed"),
      // ALL THREE violations: calc mismatch + shipped<ordered +
      // delivered<shipped -> 3 deductions
      (8L, base._1, base._2, base._3, base._4, base._5, "51.00", "2020-02-01", "2020-01-05", "2020-01-01", "Pending"))
      .toDF("supply_order_id", "product_id", "warehouse_id", "retail_store_id",
        "quantity", "price", "total_invoice", "order_date", "shipped_date",
        "delivered_date", "status")
    val r = SilverLayer.supplyOrders(bronze)
    val byId = r.clean.collect().map(x => x.getLong(0) -> x).toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 5L, 6L, 7L, 8L))
    assert(byId(1L).getAs[Boolean]("is_calculation_correct"))
    assert(byId(1L).getAs[String]("status") == "delivered")
    assert(!byId(2L).getAs[Boolean]("is_calculation_correct"))
    assert(byId(2L).getAs[String]("status") == "shipped")
    assert(!byId(3L).getAs[Boolean]("date_logic_valid"))
    assert(byId(1L).getAs[Double]("quality_score") == 100.0)
    assert(byId(2L).getAs[Double]("quality_score") < 100.0)
    assert(r.rejected.count() == 1)
    assert(r.issues.filter(col("issue_type") === "invoice_mismatch").count() == 3)  // rows 2, 5, 8
    assert(r.issues.filter(col("issue_type") === "date_order_invalid").count() == 4) // rows 3, 5, 6, 8
    assert(r.issues.filter(col("issue_type") === "delivered_before_shipped")
      .select("record_id").as[Long].collect().toSeq.sorted == Seq(6L, 8L))
    // the double-violation rows log BOTH and their score deducts both
    val flaggedOnly = r.issues.filter(col("action_taken") === "flagged")
    assert(flaggedOnly.filter(col("record_id") === 5L).count() == 2)
    assert(flaggedOnly.filter(col("record_id") === 6L).count() == 2)
    // field-level fixes log too (class contract): every row's status
    // canonicalization produces a cleaned_to_standard entry
    assert(r.issues.filter(col("issue_type") === "cleaned_to_standard" &&
      col("field_name") === "status").count() > 0)
    assert(byId(5L).getAs[Double]("quality_score") < byId(2L).getAs[Double]("quality_score"))
    assert(byId(6L).getAs[Double]("quality_score") == byId(5L).getAs[Double]("quality_score"))
    assert(!byId(6L).getAs[Boolean]("date_logic_valid"))
    // invoice=0: check skipped, flag true, perfect score
    assert(byId(7L).getAs[Boolean]("is_calculation_correct"))
    assert(byId(7L).getAs[Double]("quality_score") == 100.0)
    // triple violation: 3 flagged rows, 3 deductions -> (11-3)/11*100
    assert(flaggedOnly.filter(col("record_id") === 8L).count() == 3)
    assert(byId(8L).getAs[Double]("quality_score") == 72.73)
    assert(!byId(8L).getAs[Boolean]("is_calculation_correct"))
    assert(!byId(8L).getAs[Boolean]("date_logic_valid"))
  }

  test("inventory: negative or unparseable quantity rejects; fixes lower the score") {
    val bronze = Seq(
      (1L, "10", "20", "100", "2020-01-01"),
      (2L, "10", "20", "N/A", "2020-01-01"),     // unparseable -> rejected
      (3L, "10", "20", "100 units", "01/15/2020")) // both fields need cleaning
      .toDF("inventory_id", "product_id", "warehouse_id",
        "quantity_on_hand", "last_stocked_date")
    val r = SilverLayer.inventory(bronze)
    assert(r.clean.count() == 2 && r.rejected.count() == 1)
    val byId = r.clean.collect().map(x => x.getLong(0) -> x).toMap
    assert(byId(1L).getAs[Int]("quantity_on_hand") == 100)
    assert(byId(1L).getAs[Double]("quality_score") == 100.0)
    // '100 units' and the US-format date both count as fixed fields
    assert(byId(3L).getAs[Int]("quantity_on_hand") == 100)
    assert(byId(3L).getAs[Double]("quality_score") < 100.0)
    assert(r.issues.filter(col("record_id") === 3L).count() == 2)
  }

  test("adapters produce reference-shaped frames from the TPC-H roles") {
    val entities = SilverLayer.buildAll(name => Tables.t(spark, sf0001, name))
    assert(entities.map(_._1) == Seq("suppliers", "warehouses", "retail_stores",
      "products", "inventory", "supply_orders"))
    entities.foreach { case (name, e) =>
      assert(e.clean.count() > 0, s"$name empty")
      assert(e.clean.columns.contains("quality_score"))
      assert(e.rejected.columns.toSeq == Seq("table_name", "record", "reason"))
    }
  }
}
