package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.Cleaning._
import graft.util.Parity._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's full six-entity silver layer
  * (silver/silver_builder.py:528-1079) as set-based Spark builders:
  * suppliers, products, warehouses, retail_stores, inventory,
  * supply_orders. Each builder takes a reference-shaped bronze frame
  * and returns the (clean, rejected, issues) triple the reference
  * produces row-at-a-time:
  *
  *  - clean: the silver table with per-row quality_score
  *    (silver_builder.py:518-523);
  *  - rejected: audit.rejected_rows shape — the full original record
  *    as a JSON payload + reason + table_name
  *    (silver_builder.py:456-475, `json.dumps(record_data)`);
  *  - issues: silver.quality_issues_log shape — one row per
  *    field-level fix or flagged business-rule violation
  *    (silver_builder.py:410-421,436-454).
  *
  * Issue counting deviation (documented): the reference compares
  * `str(cleaned) != str(original)` which counts a numeric issue for
  * every Decimal re-rendering; here an issue is VALUE-level
  * distinctness (`cleaned IS DISTINCT FROM try_cast(original)`), the
  * semantics the reference intended.
  *
  * Scale notes: every builder is a narrow map (no shuffle) — clean /
  * reject / issue extraction are projections and filters over one
  * scan; the issues frame adds one explode. inventory aggregates once
  * on (product, warehouse) and supply_orders joins fact⋈orders once —
  * both AQE-planned. At 100 TB each silver table is an
  * embarrassingly-parallel rewrite of its bronze input.
  */
object SilverLayer extends QueryModule {

  /** release(): unpersists the builder's shared staged frame when the
    * caller opted into caching (buildAll does — the clean write, the
    * rejected count/write, and the issues write would otherwise each
    * recompute the whole cleaning chain from bronze). No-op without
    * caching. */
  case class Cleaned(clean: DataFrame, rejected: DataFrame, issues: DataFrame,
    release: () => Unit = () => ())

  /** Persist-on-request for the shared staged frame (one scan feeds
    * clean + rejected + issues instead of three). Without caching, a
    * non-deterministic barrier column stops Catalyst from substituting
    * the cleaning expressions into the essential-filter predicate —
    * substitution re-runs every regex and date parse once in the
    * filter and again in the output projection (~1.9× the builder's
    * cost measured at sf0.1). Every consumer projects an explicit
    * column list, so the barrier column never escapes. */
  private def maybeCache(df: DataFrame, cache: Boolean): (DataFrame, () => Unit) =
    if (cache) { val p = df.persist(); (p, () => { p.unpersist(); () }) }
    else (df.withColumn("__once", monotonically_increasing_id()), () => ())

  // ---- shared helpers --------------------------------------------

  /** 1 when the cleaned value genuinely differs from the (comparably
    * typed) original — the reference's `cleaned != original` issue
    * counter, value-level. */
  private def issueFlag(cleaned: Column, origComparable: Column): Column =
    (!(cleaned <=> origComparable)).cast(IntegerType)

  /** One quality_issues_log row per genuinely-changed field:
    * stack the (field, original, cleaned) triples, keep the changed
    * ones. Narrow: projection + explode + filter; `origComparable` is
    * the original pre-cast to the cleaned type so re-rendering alone
    * never counts as an issue. */
  private def fieldIssues(staged: DataFrame, tableName: String, idCol: String,
    triples: Seq[(String, Column, Column, Column)]): DataFrame = {
    val entries = triples.map { case (field, orig, origComparable, cleaned) =>
      when(!(cleaned <=> origComparable),
        struct(lit(field).as("field_name"),
          orig.cast(StringType).as("original_value"),
          cleaned.cast(StringType).as("cleaned_value")))
    }
    staged.select(col(idCol).cast(LongType).as("record_id"),
        explode(array_compact(array(entries: _*))).as("i"))
      .select(lit(tableName).as("table_name"), col("record_id"),
        col("i.field_name"), lit("cleaned_to_standard").as("issue_type"),
        col("i.original_value"), col("i.cleaned_value"),
        lit("cleaned").as("action_taken"))
  }

  def emptyIssues(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("table_name", StringType), StructField("record_id", LongType),
        StructField("field_name", StringType), StructField("issue_type", StringType),
        StructField("original_value", StringType), StructField("cleaned_value", StringType),
        StructField("action_taken", StringType))))

  /** audit.rejected_rows payload: whole original record as JSON
    * (silver_builder.py:464-469). */
  private def rejectedRows(df: DataFrame, origCols: Seq[String],
    tableName: String, reason: Column): DataFrame =
    df.select(lit(tableName).as("table_name"),
      to_json(struct(origCols.map(col): _*)).as("record"),
      reason.as("reason"))

  // ---- suppliers (silver_builder.py:528-612) ---------------------

  /** Input shape: supplier_id, supplier_name, contact_email,
    * phone_number. Essential: cleaned name present. Score over 4. */
  def suppliers(bronze: DataFrame, cache: Boolean = false): Cleaned = {
    val name = cleanText(col("supplier_name"))
    val email = cleanEmail(col("contact_email"))
    val phone = cleanPhone(col("phone_number"))
    val (staged, release) = maybeCache(bronze.select(col("*"),
      name.as("clean_name"), email.as("clean_email"), phone.as("clean_phone"),
      (issueFlag(name, col("supplier_name")) +
        issueFlag(email, col("contact_email")) +
        issueFlag(phone, col("phone_number"))).as("issues")), cache)
    val clean = staged.filter(col("clean_name").isNotNull).select(
      col("supplier_id"),
      col("clean_name").as("supplier_name"),
      col("clean_email").as("contact_email"),
      col("clean_phone").as("phone_number"),
      qualityScore(col("issues"), 4).as("quality_score"))
    val rejected = rejectedRows(staged.filter(col("clean_name").isNull),
      bronze.columns, "suppliers", lit("Missing supplier name"))
    val issues = fieldIssues(staged, "suppliers", "supplier_id", Seq(
      ("supplier_name", col("supplier_name"), col("supplier_name"), col("clean_name")),
      ("contact_email", col("contact_email"), col("contact_email"), col("clean_email")),
      ("phone_number", col("phone_number"), col("phone_number"), col("clean_phone"))))
    Cleaned(clean, rejected, issues, release)
  }

  // ---- products (silver_builder.py:614-731) ----------------------

  val productStatusMap: Map[String, Seq[String]] =
    Map("active" -> Seq(), "discontinued" -> Seq("inactive"))

  /** Input shape: product_id, product_name, unit_cost, selling_price,
    * product_category, status (numerics may arrive as dirty strings).
    * Essential: name + both prices. price_margin = price - cost when
    * cost > 0 else 0; cost > price is a flagged quality issue
    * (silver_builder.py:689-697). Score over 6. The category term
    * reproduces the reference quirk (silver_builder.py:656-659):
    * issues += 1 when cleaned_category != raw OR main_category !=
    * 'Uncategorized' — i.e. nearly every row with a parseable category
    * takes the deduction. */
  def products(bronze: DataFrame, cache: Boolean = false): Cleaned = {
    val dec = DecimalType(15, 4)
    val name = cleanText(col("product_name"))
    val cost = cleanDecimal(col("unit_cost"))
    val price = cleanDecimal(col("selling_price"))
    val cat = parseCategory(col("product_category"))
    // clean_category_field: cleaned text, empty/sentinel -> 'Uncategorized'
    // (silver_builder.py:204-207)
    val catClean = coalesce(cleanText(nullifySentinels(col("product_category"))),
      lit("Uncategorized"))
    val catIssue = when(!(catClean <=> col("product_category")) ||
      cat.getField("main_category") =!= lit("Uncategorized"), 1).otherwise(0)
    val status = mapStatus(col("status"), productStatusMap)
    val (staged, release) = maybeCache(bronze.select(col("*"), name.as("clean_name"),
      cost.as("clean_cost"), price.as("clean_price"),
      cat.getField("main_category").as("main_category"),
      cat.getField("sub_category").as("sub_category"),
      status.as("clean_status"),
      (issueFlag(name, col("product_name")) +
        issueFlag(cost, col("unit_cost").try_cast(dec)) +
        issueFlag(price, col("selling_price").try_cast(dec)) +
        issueFlag(status, col("status")) +
        catIssue +
        when(cost > price, 1).otherwise(0)).as("issues")), cache)
    val essential = col("clean_name").isNotNull &&
      col("clean_cost").isNotNull && col("clean_price").isNotNull
    val clean = staged.filter(essential).select(
      col("product_id"),
      col("clean_name").as("product_name"),
      col("clean_cost").cast(DoubleType).as("unit_cost"),
      col("clean_price").cast(DoubleType).as("selling_price"),
      col("main_category"), col("sub_category"),
      col("clean_status").as("status"),
      when(col("clean_cost") > 0, col("clean_price") - col("clean_cost"))
        .otherwise(lit(0)).cast(DoubleType).as("price_margin"),
      qualityScore(col("issues"), 6).as("quality_score"))
    val rejected = rejectedRows(staged.filter(!essential), bronze.columns,
      "products", lit("Missing essential data (name, unit_cost, or selling_price)"))
    val flagged = staged.filter(col("clean_cost") > col("clean_price"))
      .select(lit("products").as("table_name"),
        col("product_id").cast(LongType).as("record_id"),
        lit("pricing").as("field_name"),
        lit("cost_higher_than_price").as("issue_type"),
        concat(lit("cost:"), col("clean_cost").cast(StringType),
          lit(", price:"), col("clean_price").cast(StringType)).as("original_value"),
        lit(null).cast(StringType).as("cleaned_value"),
        lit("flagged").as("action_taken"))
    val issues = fieldIssues(staged, "products", "product_id", Seq(
      ("product_name", col("product_name"), col("product_name"), col("clean_name")),
      ("unit_cost", col("unit_cost"), col("unit_cost").try_cast(dec), col("clean_cost")),
      ("selling_price", col("selling_price"), col("selling_price").try_cast(dec), col("clean_price")),
      ("status", col("status"), col("status"), col("clean_status"))))
      .unionByName(flagged)
    Cleaned(clean, rejected, issues, release)
  }

  // ---- warehouses (silver_builder.py:733-814) --------------------

  /** Input shape: warehouse_id, warehouse_name, city, region,
    * storage_capacity. Essential: name. Score over 5. */
  def warehouses(bronze: DataFrame, cache: Boolean = false): Cleaned = {
    val name = cleanText(col("warehouse_name"))
    val capacity = cleanInteger(col("storage_capacity"))
    val (staged, release) = maybeCache(bronze.select(col("*"), name.as("clean_name"),
      cleanText(col("city")).as("clean_city"),
      cleanText(col("region")).as("clean_region"),
      capacity.as("clean_capacity"),
      (issueFlag(name, col("warehouse_name")) +
        issueFlag(cleanText(col("city")), col("city")) +
        issueFlag(cleanText(col("region")), col("region")) +
        issueFlag(capacity, col("storage_capacity").try_cast(IntegerType))).as("issues")), cache)
    val clean = staged.filter(col("clean_name").isNotNull).select(
      col("warehouse_id"),
      col("clean_name").as("warehouse_name"),
      col("clean_city").as("city"),
      col("clean_region").as("region"),
      col("clean_capacity").as("storage_capacity"),
      qualityScore(col("issues"), 5).as("quality_score"))
    val rejected = rejectedRows(staged.filter(col("clean_name").isNull),
      bronze.columns, "warehouses", lit("Missing warehouse name"))
    val issues = fieldIssues(staged, "warehouses", "warehouse_id", Seq(
      ("warehouse_name", col("warehouse_name"), col("warehouse_name"), col("clean_name")),
      ("city", col("city"), col("city"), col("clean_city")),
      ("region", col("region"), col("region"), col("clean_region")),
      ("storage_capacity", col("storage_capacity"),
        col("storage_capacity").try_cast(IntegerType), col("clean_capacity"))))
    Cleaned(clean, rejected, issues, release)
  }

  // ---- retail_stores (silver_builder.py:816-905) -----------------

  val storeStatusMap: Map[String, Seq[String]] = Map(
    "active" -> Seq("open"),
    "inactive" -> Seq(),
    "closed" -> Seq("shutdown"))

  /** Input shape: retail_store_id, store_name, city, region,
    * store_type, store_status. Essential: name. Score over 6. */
  def retailStores(bronze: DataFrame, cache: Boolean = false): Cleaned = {
    val name = cleanText(col("store_name"))
    val status = mapStatus(col("store_status"), storeStatusMap)
    val (staged, release) = maybeCache(bronze.select(col("*"), name.as("clean_name"),
      cleanText(col("city")).as("clean_city"),
      cleanText(col("region")).as("clean_region"),
      cleanText(col("store_type")).as("clean_type"),
      status.as("clean_status"),
      (issueFlag(name, col("store_name")) +
        issueFlag(cleanText(col("city")), col("city")) +
        issueFlag(cleanText(col("region")), col("region")) +
        issueFlag(cleanText(col("store_type")), col("store_type")) +
        issueFlag(status, col("store_status"))).as("issues")), cache)
    val clean = staged.filter(col("clean_name").isNotNull).select(
      col("retail_store_id"),
      col("clean_name").as("store_name"),
      col("clean_city").as("city"),
      col("clean_region").as("region"),
      col("clean_type").as("store_type"),
      col("clean_status").as("store_status"),
      qualityScore(col("issues"), 6).as("quality_score"))
    val rejected = rejectedRows(staged.filter(col("clean_name").isNull),
      bronze.columns, "retail_stores", lit("Missing store name"))
    val issues = fieldIssues(staged, "retail_stores", "retail_store_id", Seq(
      ("store_name", col("store_name"), col("store_name"), col("clean_name")),
      ("city", col("city"), col("city"), col("clean_city")),
      ("region", col("region"), col("region"), col("clean_region")),
      ("store_type", col("store_type"), col("store_type"), col("clean_type")),
      ("store_status", col("store_status"), col("store_status"), col("clean_status"))))
    Cleaned(clean, rejected, issues, release)
  }

  // ---- inventory (silver_builder.py:1023-1090) -------------------

  /** Input shape: inventory_id, product_id, warehouse_id,
    * quantity_on_hand, last_stocked_date. Essential: quantity present
    * and non-negative. Score over 5. */
  def inventory(bronze: DataFrame, cache: Boolean = false): Cleaned = {
    val qty = cleanInteger(col("quantity_on_hand"))
    val date = parseDateMulti(col("last_stocked_date"))
    val (staged, release) = maybeCache(bronze.select(col("*"),
      qty.as("clean_qty"), date.as("clean_date"),
      (issueFlag(qty, col("quantity_on_hand").try_cast(IntegerType)) +
        issueFlag(date, col("last_stocked_date").try_cast(DateType))).as("issues")), cache)
    val essential = col("clean_qty").isNotNull && col("clean_qty") >= 0
    val clean = staged.filter(essential).select(
      col("inventory_id"), col("product_id"), col("warehouse_id"),
      col("clean_qty").as("quantity_on_hand"),
      col("clean_date").as("last_stocked_date"),
      qualityScore(col("issues"), 5).as("quality_score"))
    val rejected = rejectedRows(staged.filter(!essential), bronze.columns,
      "inventory", lit("Invalid or negative quantity"))
    val issues = fieldIssues(staged, "inventory", "inventory_id", Seq(
      ("quantity_on_hand", col("quantity_on_hand"),
        col("quantity_on_hand").try_cast(IntegerType), col("clean_qty")),
      ("last_stocked_date", col("last_stocked_date"),
        col("last_stocked_date").try_cast(DateType), col("clean_date"))))
    Cleaned(clean, rejected, issues, release)
  }

  // ---- supply_orders (silver_builder.py:907-1021) ----------------

  val supplyOrderStatusMap: Map[String, Seq[String]] = Map(
    "pending" -> Seq("awaiting", "processing", "in process"),
    "shipped" -> Seq("dispatched", "in transit", "on route"),
    "delivered" -> Seq("complete", "completed", "received"),
    "cancelled" -> Seq("canceled", "void"))

  /** Input shape: supply_order_id, product_id, warehouse_id,
    * retail_store_id, quantity, price, total_invoice, order_date,
    * shipped_date, delivered_date, status. Essential: order_date,
    * quantity (non-negative), price. Business validations
    * (silver_builder.py:964-985): the calculation check
    * (|invoice - qty*price| <= 0.01) is SKIPPED when the cleaned
    * invoice is falsy (NULL or 0); shipped-before-ordered and
    * delivered-before-shipped are TWO separate issue deductions (a
    * row violating both loses 2 of its 11-field score) while
    * date_logic_valid stays one combined boolean column. */
  def supplyOrders(bronze: DataFrame, cache: Boolean = false): Cleaned = {
    val qty = cleanInteger(col("quantity"))
    val price = cleanDecimal(col("price"))
    val invoice = cleanDecimal(col("total_invoice"))
    val oDate = parseDateMulti(col("order_date"))
    val sDate = parseDateMulti(col("shipped_date"))
    val dDate = parseDateMulti(col("delivered_date"))
    val status = mapStatus(col("status"), supplyOrderStatusMap)
    val calcOk = invoice.isNull || invoice === lit(0) ||
      abs(invoice - qty.cast(DecimalType(15, 4)) * price) <= lit(0.01)
    val shipLate = coalesce(sDate < oDate, lit(false))
    val delivLate = coalesce(dDate < sDate, lit(false))
    val datesOk = !shipLate && !delivLate
    val (staged, release) = maybeCache(bronze.select(col("*"),
      qty.as("clean_qty"), price.as("clean_price"), invoice.as("clean_invoice"),
      oDate.as("clean_order_date"), sDate.as("clean_shipped_date"),
      dDate.as("clean_delivered_date"), status.as("clean_status"),
      calcOk.as("calc_ok"), datesOk.as("dates_ok"),
      shipLate.as("ship_late"), delivLate.as("deliv_late"),
      (when(!calcOk, 1).otherwise(0) + when(shipLate, 1).otherwise(0) +
        when(delivLate, 1).otherwise(0)).as("issues")), cache)
    val essential = col("clean_order_date").isNotNull &&
      col("clean_qty").isNotNull && col("clean_qty") >= 0 &&
      col("clean_price").isNotNull
    val clean = staged.filter(essential).select(
      col("supply_order_id"),
      cleanInteger(col("product_id")).as("product_id"),
      cleanInteger(col("warehouse_id")).as("warehouse_id"),
      cleanInteger(col("retail_store_id")).as("retail_store_id"),
      col("clean_qty").as("quantity"),
      col("clean_price").cast(DoubleType).as("price"),
      col("clean_invoice").cast(DoubleType).as("total_invoice"),
      col("clean_order_date").as("order_date"),
      col("clean_shipped_date").as("shipped_date"),
      col("clean_delivered_date").as("delivered_date"),
      col("clean_status").as("status"),
      col("calc_ok").as("is_calculation_correct"),
      col("dates_ok").as("date_logic_valid"),
      qualityScore(col("issues"), 11).as("quality_score"))
    val rejected = rejectedRows(staged.filter(!essential), bronze.columns,
      "supply_orders", lit("Missing essential data (order_date, quantity, or price)"))
    // one issue row PER violation — a row failing both checks logs
    // both, matching its 2-issue quality deduction
    def flagRows(cond: Column, field: String, issueType: String) =
      staged.filter(cond)
        .select(lit("supply_orders").as("table_name"),
          col("supply_order_id").cast(LongType).as("record_id"),
          lit(field).as("field_name"),
          lit(issueType).as("issue_type"),
          concat(lit("qty:"), col("clean_qty").cast(StringType),
            lit(", price:"), col("clean_price").cast(StringType),
            lit(", invoice:"), col("clean_invoice").cast(StringType)).as("original_value"),
          lit(null).cast(StringType).as("cleaned_value"),
          lit("flagged").as("action_taken"))
    // field-level cleaned_to_standard rows like every other builder
    // (the class contract: one row per field fix OR flagged violation)
    val dec = DecimalType(15, 4)
    val cleaned = fieldIssues(staged, "supply_orders", "supply_order_id", Seq(
      ("quantity", col("quantity"), col("quantity").try_cast(IntegerType), col("clean_qty")),
      ("price", col("price"), col("price").try_cast(dec), col("clean_price")),
      ("total_invoice", col("total_invoice"), col("total_invoice").try_cast(dec), col("clean_invoice")),
      ("order_date", col("order_date"), col("order_date").try_cast(DateType), col("clean_order_date")),
      ("shipped_date", col("shipped_date"), col("shipped_date").try_cast(DateType), col("clean_shipped_date")),
      ("delivered_date", col("delivered_date"), col("delivered_date").try_cast(DateType), col("clean_delivered_date")),
      ("status", col("status"), col("status"), col("clean_status"))))
    // plus one issue row per distinct violation, mirroring the
    // per-violation deductions above (silver_builder.py:975-985)
    val flagged = cleaned
      .unionByName(flagRows(!col("calc_ok"), "calculation", "invoice_mismatch"))
      .unionByName(flagRows(col("ship_late"), "dates", "date_order_invalid"))
      .unionByName(flagRows(col("deliv_late"), "dates", "delivered_before_shipped"))
    Cleaned(clean, rejected, flagged, release)
  }

  // ---- TPC-H-role adapters (the repo's bronze -> reference shape) --

  /** supplier -> reference supplier shape. Contact fields are absent
    * from the testdata; derive them deterministically from the key —
    * same stand-in construction as q15 (the Sheets extract the
    * reference loads has them, bronze/data_loader.py:112-181). */
  def suppliersFromTpch(sup: DataFrame): DataFrame = sup.select(
    col("s_suppkey").as("supplier_id"),
    col("s_name").as("supplier_name"),
    concat(lit("contact."), col("s_suppkey"), lit("@example.com")).as("contact_email"),
    concat(lit("(555) 123-"), lpad(pmod(col("s_suppkey"), lit(10000)).cast(StringType), 4, "0"))
      .as("phone_number"))

  /** part -> reference product shape; unit_cost uses the dashboard's
    * retailprice/10 cost proxy (gold/gold_builder.py:311). */
  def productsFromTpch(part: DataFrame): DataFrame = part.select(
    col("p_partkey").as("product_id"),
    col("p_name").as("product_name"),
    moneyRound(col("p_retailprice") / lit(10.0)).cast(StringType).as("unit_cost"),
    col("p_retailprice").cast(StringType).as("selling_price"),
    concat(col("p_brand"), lit(" > "), col("p_type")).as("product_category"),
    lit("active").as("status"))

  /** nation ⋈ region -> reference warehouse shape (25 rows; capacity
    * derived from the key so utilization math has variation). */
  def warehousesFromTpch(nation: DataFrame, region: DataFrame): DataFrame =
    nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("n_nationkey").as("warehouse_id"),
        concat(lit("Warehouse "), col("n_name")).as("warehouse_name"),
        col("n_name").as("city"),
        col("r_name").as("region"),
        ((col("n_nationkey") + 1) * 50000).cast(StringType).as("storage_capacity"))

  /** customer ⋈ nation ⋈ region -> reference retail-store shape. */
  def retailStoresFromTpch(customer: DataFrame, nation: DataFrame,
    region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("c_custkey").as("retail_store_id"),
        col("c_name").as("store_name"),
        col("n_name").as("city"),
        col("r_name").as("region"),
        col("c_mktsegment").as("store_type"),
        lit("Open").as("store_status"))

  /** lineitem -> inventory snapshot: on-hand = total shipped quantity
    * per (part, supplier-as-warehouse), last stocked = latest ship.
    * One hash aggregation — partial map-side combine, scales. */
  def inventoryFromTpch(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(IntegerType)).as("qty"),
        max(col("l_shipdate").cast(DateType)).as("last_stocked"))
      .select(
        // collision-free at any SF: suppkey occupies the low 32 bits
        // (a *100 encoding collides once suppkey exceeds 99 — 12% of
        // (part, supplier) groups at sf0.1)
        (shiftleft(col("l_partkey").cast(LongType), 32) + col("l_suppkey"))
          .as("inventory_id"),
        col("l_partkey").cast(StringType).as("product_id"),
        col("l_suppkey").cast(StringType).as("warehouse_id"),
        col("qty").cast(StringType).as("quantity_on_hand"),
        date_format(col("last_stocked"), "yyyy-MM-dd").as("last_stocked_date"))

  /** lineitem ⋈ orders -> reference supply-order shape. delivered is
    * the reference's ship+3 expectation (gold/gold_builder.py:345). */
  def supplyOrdersFromTpch(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("supply_order_id"),
        col("l_partkey").cast(StringType).as("product_id"),
        col("l_suppkey").cast(StringType).as("warehouse_id"),
        col("o_custkey").cast(StringType).as("retail_store_id"),
        col("l_quantity").cast(IntegerType).cast(StringType).as("quantity"),
        moneyRound(col("l_extendedprice") / col("l_quantity"), 4).cast(StringType).as("price"),
        col("l_extendedprice").cast(StringType).as("total_invoice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("shipped_date"),
        date_format(date_add(col("l_shipdate").cast(DateType), 3), "yyyy-MM-dd").as("delivered_date"),
        when(col("o_orderstatus") === "F", "Completed")
          .when(col("o_orderstatus") === "O", "Processing")
          .otherwise("In Transit").as("status"))

  /** All six entities in the reference's dependency-free order
    * (silver_builder.py:1117-1124). */
  def buildAll(bronzeOf: String => DataFrame): Seq[(String, Cleaned)] = Seq(
    "suppliers" -> suppliers(suppliersFromTpch(bronzeOf("supplier")), cache = true),
    "warehouses" -> warehouses(warehousesFromTpch(bronzeOf("nation"), bronzeOf("region")), cache = true),
    "retail_stores" -> retailStores(retailStoresFromTpch(
      bronzeOf("customer"), bronzeOf("nation"), bronzeOf("region")), cache = true),
    "products" -> products(productsFromTpch(bronzeOf("part")), cache = true),
    "inventory" -> inventory(inventoryFromTpch(bronzeOf("lineitem")), cache = true),
    "supply_orders" -> supplyOrders(supplyOrdersFromTpch(
      bronzeOf("lineitem"), bronzeOf("orders")), cache = true))

  // ---- q49: the products builder under oracle verification ---------

  /** q49 — the full silver products builder over a deterministically
    * dirtied bronze frame: text cleaning, category parse with typo
    * fixes, decimal extraction, status mapping, margin math,
    * cost>price flagging, 6-field quality score, essential-field
    * rejection (m∈{1,3} rows clean to NULL and drop). */
  def silverProducts(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.t(s, dir, "part")
    val m = pmod(col("p_partkey"), lit(5))
    val dirty = p.select(
      col("p_partkey").as("product_id"),
      when(m === 0, concat(lit("  "), upper(col("p_name")), lit("  ")))
        .when(m === 1, lit("   ")) // rejects: cleans to NULL
        .otherwise(col("p_name")).as("product_name"),
      // m=2 seeds cost above price -> flagged issue; m=3 rejects
      when(m === 2, concat(lit("$"), moneyRound(col("p_retailprice") * lit(2.0)).cast(StringType)))
        .when(m === 3, lit("N/A"))
        .otherwise(moneyRound(col("p_retailprice") / lit(10.0)).cast(StringType)).as("unit_cost"),
      concat(col("p_retailprice").cast(StringType), lit(" USD")).as("selling_price"),
      when(m === 0, lit("autmootive > battreies"))
        .when(m === 1, col("p_brand"))
        .otherwise(concat(col("p_brand"), lit(" > "), col("p_type"))).as("product_category"),
      when(m === 0, lit("ACTIVE")).when(m === 2, lit("inactive"))
        .otherwise(lit("active")).as("status"))
    products(dirty).clean.orderBy(col("product_id"))
  }

  private val silverProductsSql = {
    val initcap = (x: String) =>
      s"array_to_string(list_transform(string_split($x, ' '), w -> upper(w[1]) || lower(w[2:])), ' ')"
    val cleanDec = (x: String) => {
      val m = s"TRY_CAST(regexp_extract(regexp_replace(trim($x), ',', '', 'g'), '[-+]?[0-9]*\\.?[0-9]+', 0) AS DECIMAL(15,4))"
      s"CASE WHEN $m < 0 THEN CAST(0 AS DECIMAL(15,4)) ELSE $m END"
    }
    val fix = (x: String) => {
      val cases = Map("autmootive" -> "Automotive", "battreies" -> "Batteries",
        "electronis" -> "Electronics", "toools" -> "Tools")
        .map { case (t, c) => s"WHEN lower(trim($x)) = '$t' THEN '$c'" }.mkString(" ")
      s"CASE $cases ELSE ${initcap(s"lower(trim($x))")} END"
    }
    val statusSql =
      """CASE WHEN status IS NULL THEN 'unknown'
        |     WHEN lower(trim(status)) IN ('active') THEN 'active'
        |     WHEN lower(trim(status)) IN ('inactive', 'discontinued') THEN 'discontinued'
        |     ELSE lower(trim(status)) END""".stripMargin
    s"""SELECT product_id, clean_name AS product_name,
       |       CAST(clean_cost AS DOUBLE) AS unit_cost,
       |       CAST(clean_price AS DOUBLE) AS selling_price,
       |       CASE WHEN cat IS NULL OR trim(raw_main) = '' THEN 'Uncategorized' ELSE ${fix("raw_main")} END AS main_category,
       |       CASE WHEN cat IS NULL OR trim(raw_sub) = '' THEN 'General' ELSE ${fix("raw_sub")} END AS sub_category,
       |       ($statusSql) AS status,
       |       CAST(CASE WHEN clean_cost > 0 THEN clean_price - clean_cost ELSE 0 END AS DOUBLE) AS price_margin,
       |       ${snapRoundSql("CAST(6 - issues AS DOUBLE) / 6.0 * 100.0")} AS quality_score
       |FROM (
       |  SELECT *,
       |         CASE WHEN regexp_matches(cat, '[>\\-|/]') THEN regexp_extract(cat, '^([^>\\-|/]*)[>\\-|/]', 1) ELSE cat END AS raw_main,
       |         CASE WHEN regexp_matches(cat, '[>\\-|/]') THEN regexp_extract(cat, '^[^>\\-|/]*[>\\-|/](.*)$$', 1) ELSE '' END AS raw_sub,
       |         (CASE WHEN clean_name IS DISTINCT FROM product_name THEN 1 ELSE 0 END
       |          + CASE WHEN clean_cost IS DISTINCT FROM TRY_CAST(unit_cost AS DECIMAL(15,4)) THEN 1 ELSE 0 END
       |          + CASE WHEN clean_price IS DISTINCT FROM TRY_CAST(selling_price AS DECIMAL(15,4)) THEN 1 ELSE 0 END
       |          + CASE WHEN ($statusSql) IS DISTINCT FROM status THEN 1 ELSE 0 END
       |          + CASE WHEN clean_cat IS DISTINCT FROM product_category
       |                   OR (CASE WHEN cat IS NULL OR trim(raw_main) = '' THEN 'Uncategorized' ELSE ${fix("raw_main")} END) != 'Uncategorized'
       |            THEN 1 ELSE 0 END
       |          + CASE WHEN clean_cost > clean_price THEN 1 ELSE 0 END) AS issues
       |  FROM (
       |    SELECT product_id, product_name, unit_cost, selling_price, status, product_category,
       |           trim(regexp_replace(product_name, '\\s+', ' ', 'g')) AS cn_c1,
       |           trim(regexp_replace(cn_c1, '^[^\\p{L}\\p{N}_\\s]+|[^\\p{L}\\p{N}_\\s]+$$', '', 'g')) AS cn_c2,
       |           nullif(CASE WHEN cn_c2 = upper(cn_c2) OR cn_c2 = lower(cn_c2)
       |                       THEN ${initcap("cn_c2")} ELSE cn_c2 END, '') AS clean_name,
       |           ${cleanDec("unit_cost")} AS clean_cost,
       |           ${cleanDec("selling_price")} AS clean_price,
       |           CASE WHEN upper(trim(product_category)) IN ('NULL','N/A','NOT AVAILABLE','TBD','UNKNOWN','','NONE','NIL')
       |                THEN NULL ELSE trim(product_category) END AS cat,
       |           trim(regexp_replace(cat, '\\s+', ' ', 'g')) AS cc_c1,
       |           trim(regexp_replace(cc_c1, '^[^\\p{L}\\p{N}_\\s]+|[^\\p{L}\\p{N}_\\s]+$$', '', 'g')) AS cc_c2,
       |           coalesce(nullif(CASE WHEN cc_c2 = upper(cc_c2) OR cc_c2 = lower(cc_c2)
       |                                THEN ${initcap("cc_c2")} ELSE cc_c2 END, ''), 'Uncategorized') AS clean_cat
       |    FROM (
       |      SELECT p_partkey AS product_id,
       |             CASE WHEN p_partkey % 5 = 0 THEN '  ' || upper(p_name) || '  '
       |                  WHEN p_partkey % 5 = 1 THEN '   '
       |                  ELSE p_name END AS product_name,
       |             CASE WHEN p_partkey % 5 = 2 THEN '$$' || CAST(CAST(round(CAST(p_retailprice * 2.0 AS DECIMAL(18,4)), 2) AS DOUBLE) AS VARCHAR)
       |                  WHEN p_partkey % 5 = 3 THEN 'N/A'
       |                  ELSE CAST(CAST(round(CAST(p_retailprice / 10.0 AS DECIMAL(18,4)), 2) AS DOUBLE) AS VARCHAR) END AS unit_cost,
       |             CAST(p_retailprice AS VARCHAR) || ' USD' AS selling_price,
       |             CASE WHEN p_partkey % 5 = 0 THEN 'autmootive > battreies'
       |                  WHEN p_partkey % 5 = 1 THEN p_brand
       |                  ELSE p_brand || ' > ' || p_type END AS product_category,
       |             CASE WHEN p_partkey % 5 = 0 THEN 'ACTIVE'
       |                  WHEN p_partkey % 5 = 2 THEN 'inactive'
       |                  ELSE 'active' END AS status
       |      FROM part)))
       |WHERE clean_name IS NOT NULL AND clean_cost IS NOT NULL AND clean_price IS NOT NULL
       |ORDER BY product_id""".stripMargin
  }

  // ---- q56: the supply-orders builder under oracle verification ----

  /** q56 — the full silver supply_orders builder over a
    * deterministically dirtied bronze frame seeded from `orders`
    * (m = o_orderkey % 7): m=0 clean, m=1 invoice mismatch, m=2
    * invoice 0 (calc check skipped — reference falsy semantics),
    * m=3 shipped-before-ordered, m=4 delivered-before-shipped,
    * m=5 calc + BOTH date violations (3 deductions), m=6 rejected
    * (unparseable order_date). Pins the per-violation issue scoring
    * of silver_builder.py:964-985. */
  def silverSupplyOrders(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.t(s, dir, "orders")
    val m = pmod(col("o_orderkey"), lit(7))
    val qty = (pmod(col("o_orderkey"), lit(50)) + 1).cast(IntegerType)
    val priceD = round((col("o_totalprice") / lit(100.0)).cast(DecimalType(18, 4)), 2)
      .cast(DecimalType(15, 2))
    val invoiceD = (qty * priceD).cast(DecimalType(15, 2))
    val ship = when(m.isin(3, 5), date_sub(col("o_orderdate"), 3))
      .otherwise(date_add(col("o_orderdate"), 2))
    val deliv = when(m.isin(4, 5), date_sub(ship, 2)).otherwise(date_add(ship, 3))
    val dirty = o.select(
      col("o_orderkey").as("supply_order_id"),
      col("o_custkey").cast(StringType).as("product_id"),
      pmod(col("o_orderkey"), lit(25)).cast(StringType).as("warehouse_id"),
      col("o_custkey").cast(StringType).as("retail_store_id"),
      concat(qty.cast(StringType), lit(" units")).as("quantity"),
      concat(lit("$"), priceD.cast(StringType)).as("price"),
      when(m.isin(1, 5), (invoiceD + 5).cast(DecimalType(15, 2)).cast(StringType))
        .when(m === 2, lit("0.00"))
        .otherwise(invoiceD.cast(StringType)).as("total_invoice"),
      when(m === 6, lit("TBD"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("order_date"),
      date_format(ship, "yyyy-MM-dd").as("shipped_date"),
      date_format(deliv, "yyyy-MM-dd").as("delivered_date"),
      when(m === 0, lit("dispatched")).when(m === 1, lit("Complete"))
        .when(m === 2, lit("CANCELLED")).when(m === 3, lit("processing"))
        .when(m === 4, lit("received")).when(m === 5, lit("On Route"))
        .otherwise(lit("weird status")).as("status"))
    // per-partition sort, not a total order (guide §2.4, the q04
    // rule): the output is orders-sized and the range exchange's
    // sampling pass re-runs the whole cleaning projection
    supplyOrders(dirty).clean.sortWithinPartitions(col("supply_order_id"))
  }

  private val silverSupplyOrdersSql = {
    val cleanDec = (x: String) => {
      val m = s"TRY_CAST(regexp_extract(regexp_replace(trim($x), ',', '', 'g'), '[-+]?[0-9]*\\.?[0-9]+', 0) AS DECIMAL(15,4))"
      s"CASE WHEN $m < 0 THEN CAST(0 AS DECIMAL(15,4)) ELSE $m END"
    }
    val cleanInt = (x: String) =>
      s"TRY_CAST(regexp_extract(trim($x), '[0-9]+', 0) AS INTEGER)"
    val statusSql =
      """CASE WHEN status IS NULL THEN 'unknown'
        |     WHEN lower(trim(status)) IN ('pending','awaiting','processing','in process') THEN 'pending'
        |     WHEN lower(trim(status)) IN ('shipped','dispatched','in transit','on route') THEN 'shipped'
        |     WHEN lower(trim(status)) IN ('delivered','complete','completed','received') THEN 'delivered'
        |     WHEN lower(trim(status)) IN ('cancelled','canceled','void') THEN 'cancelled'
        |     ELSE lower(trim(status)) END""".stripMargin
    s"""SELECT supply_order_id, ${cleanInt("product_id")} AS product_id,
       |       ${cleanInt("warehouse_id")} AS warehouse_id,
       |       ${cleanInt("retail_store_id")} AS retail_store_id,
       |       clean_qty AS quantity,
       |       CAST(clean_price AS DOUBLE) AS price,
       |       CAST(clean_invoice AS DOUBLE) AS total_invoice,
       |       clean_order_date AS order_date,
       |       clean_shipped_date AS shipped_date,
       |       clean_delivered_date AS delivered_date,
       |       ($statusSql) AS status,
       |       calc_ok AS is_calculation_correct,
       |       NOT (ship_late OR deliv_late) AS date_logic_valid,
       |       ${snapRoundSql("CAST(11 - (CASE WHEN calc_ok THEN 0 ELSE 1 END + CASE WHEN ship_late THEN 1 ELSE 0 END + CASE WHEN deliv_late THEN 1 ELSE 0 END) AS DOUBLE) / 11.0 * 100.0")} AS quality_score
       |FROM (
       |  SELECT *,
       |         (clean_invoice IS NULL OR clean_invoice = 0
       |          OR abs(clean_invoice - CAST(clean_qty AS DECIMAL(15,4)) * clean_price) <= 0.01) AS calc_ok,
       |         coalesce(clean_shipped_date < clean_order_date, false) AS ship_late,
       |         coalesce(clean_delivered_date < clean_shipped_date, false) AS deliv_late
       |  FROM (
       |    SELECT supply_order_id, product_id, warehouse_id, retail_store_id, status,
       |           ${cleanInt("quantity")} AS clean_qty,
       |           ${cleanDec("price")} AS clean_price,
       |           ${cleanDec("total_invoice")} AS clean_invoice,
       |           TRY_CAST(trim(order_date) AS DATE) AS clean_order_date,
       |           TRY_CAST(trim(shipped_date) AS DATE) AS clean_shipped_date,
       |           TRY_CAST(trim(delivered_date) AS DATE) AS clean_delivered_date
       |    FROM (
       |      SELECT CAST(o_orderdate AS DATE) AS od,
       |             o_orderkey AS supply_order_id,
       |             CAST(o_custkey AS VARCHAR) AS product_id,
       |             CAST(o_orderkey % 25 AS VARCHAR) AS warehouse_id,
       |             CAST(o_custkey AS VARCHAR) AS retail_store_id,
       |             CAST(o_orderkey % 50 + 1 AS VARCHAR) || ' units' AS quantity,
       |             '$$' || CAST(CAST(round(CAST(o_totalprice / 100.0 AS DECIMAL(18,4)), 2) AS DECIMAL(15,2)) AS VARCHAR) AS price,
       |             CASE WHEN o_orderkey % 7 IN (1, 5) THEN CAST(CAST(CAST(o_orderkey % 50 + 1 AS INTEGER) * CAST(round(CAST(o_totalprice / 100.0 AS DECIMAL(18,4)), 2) AS DECIMAL(15,2)) + 5 AS DECIMAL(15,2)) AS VARCHAR)
       |                  WHEN o_orderkey % 7 = 2 THEN '0.00'
       |                  ELSE CAST(CAST(CAST(o_orderkey % 50 + 1 AS INTEGER) * CAST(round(CAST(o_totalprice / 100.0 AS DECIMAL(18,4)), 2) AS DECIMAL(15,2)) AS DECIMAL(15,2)) AS VARCHAR) END AS total_invoice,
       |             CASE WHEN o_orderkey % 7 = 6 THEN 'TBD'
       |                  ELSE strftime(od, '%Y-%m-%d') END AS order_date,
       |             strftime(CASE WHEN o_orderkey % 7 IN (3, 5) THEN od - 3 ELSE od + 2 END, '%Y-%m-%d') AS shipped_date,
       |             strftime(CASE WHEN o_orderkey % 7 IN (4, 5)
       |                           THEN (CASE WHEN o_orderkey % 7 IN (3, 5) THEN od - 3 ELSE od + 2 END) - 2
       |                           ELSE (CASE WHEN o_orderkey % 7 IN (3, 5) THEN od - 3 ELSE od + 2 END) + 3 END, '%Y-%m-%d') AS delivered_date,
       |             CASE WHEN o_orderkey % 7 = 0 THEN 'dispatched' WHEN o_orderkey % 7 = 1 THEN 'Complete'
       |                  WHEN o_orderkey % 7 = 2 THEN 'CANCELLED' WHEN o_orderkey % 7 = 3 THEN 'processing'
       |                  WHEN o_orderkey % 7 = 4 THEN 'received' WHEN o_orderkey % 7 = 5 THEN 'On Route'
       |                  ELSE 'weird status' END AS status
       |      FROM orders)))
       |WHERE clean_order_date IS NOT NULL AND clean_qty IS NOT NULL
       |  AND clean_qty >= 0 AND clean_price IS NOT NULL
       |ORDER BY supply_order_id""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q49_silver_products" -> silverProducts,
      "q56_silver_supply_orders" -> silverSupplyOrders)

  override def oracles: Map[String, String] =
    Map("q49_silver_products" -> silverProductsSql,
      "q56_silver_supply_orders" -> silverSupplyOrdersSql)
}
