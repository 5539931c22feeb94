package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.Cleaning._
import graft.util.Parity._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The silver layer: the reference's row-at-a-time Python cleaners
  * (silver/silver_builder.py) as set-based Spark transforms. The
  * testdata is clean, so each query first synthesizes *deterministic*
  * dirt (keyed on row ids — same construction in the oracle SQL), then
  * cleans it back with graft.functions.Cleaning. This proves the
  * cleaning semantics end-to-end against DuckDB, including the
  * reference's quirks (sign-dropping, US-first date precedence).
  *
  * At scale these are embarrassingly parallel narrow maps — no
  * shuffle; the only wide op is q17's join to orders.
  */
object SilverClean extends QueryModule {

  // ---- DuckDB mirror helpers -------------------------------------

  /** DuckDB has no initcap; emulate Spark's (capitalize first char of
    * each space-delimited word, lowercase the rest). */
  private def initcapSql(x: String): String =
    s"array_to_string(list_transform(string_split($x, ' '), w -> upper(w[1]) || lower(w[2:])), ' ')"

  private def cleanTextSql(x: String, out: String): String =
    s"""trim(regexp_replace($x, '\\s+', ' ', 'g')) AS ${out}_c1,
       |       trim(regexp_replace(${out}_c1, '^[^\\p{L}\\p{N}_\\s]+|[^\\p{L}\\p{N}_\\s]+$$', '', 'g')) AS ${out}_c2,
       |       nullif(CASE WHEN ${out}_c2 = upper(${out}_c2) OR ${out}_c2 = lower(${out}_c2)
       |                   THEN ${initcapSql(s"${out}_c2")} ELSE ${out}_c2 END, '') AS $out""".stripMargin

  private def cleanEmailSql(x: String): String =
    s"CASE WHEN regexp_matches(lower(trim($x)), '^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$$') THEN lower(trim($x)) END"

  private def cleanPhoneSql(x: String): String =
    s"""CASE WHEN length(regexp_replace(regexp_replace(trim($x), '[^0-9+()\\-]', '', 'g'), '[^0-9]', '', 'g')) >= 10
       | THEN regexp_replace(trim($x), '[^0-9+()\\-]', '', 'g') END""".stripMargin.replace("\n", "")

  private def cleanIntegerSql(x: String): String =
    s"TRY_CAST(regexp_extract(trim($x), '[0-9]+', 0) AS INTEGER)"

  private def cleanDecimalSql(x: String): String = {
    val m = s"TRY_CAST(regexp_extract(regexp_replace(trim($x), ',', '', 'g'), '[-+]?[0-9]*\\.?[0-9]+', 0) AS DECIMAL(15,4))"
    s"CASE WHEN $m < 0 THEN CAST(0 AS DECIMAL(15,4)) ELSE $m END"
  }

  private def parseDateSql(x: String): String =
    Seq("%Y-%m-%d", "%m/%d/%Y", "%d/%m/%Y", "%d-%m-%Y", "%Y/%m/%d")
      .map(f => s"try_strptime(trim($x), '$f')")
      .mkString("CAST(coalesce(", ", ", ") AS DATE)")

  private def mapStatusSql(x: String): String = {
    val cases = orderStatusMap.toSeq.sortBy(_._1).map { case (std, vs) =>
      val list = (vs :+ std).map(v => s"'${v.toLowerCase}'").mkString(", ")
      s"WHEN lower(trim($x)) IN ($list) THEN '$std'"
    }.mkString(" ")
    s"CASE WHEN $x IS NULL THEN 'unknown' $cases ELSE lower(trim($x)) END"
  }

  // ---- q15: supplier text cleaning -------------------------------

  /** q15 — §2.8 string cleaners (P1/P7): trim/collapse/edge-strip/
    * conditional title-case, email validation, phone validation over
    * synthesized dirty supplier contact data. */
  def cleanSupplierText(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.t(s, dir, "supplier")
    val m = pmod(col("s_suppkey"), lit(3))
    val dirtyName = when(m === 0, concat(lit("  "), upper(col("s_name")), lit("  ")))
      .when(m === 1, concat(lit("##"), lower(col("s_name")), lit("!!")))
      .otherwise(concat(lit(" "), col("s_name"), lit("   extra   spaces ")))
    val m2 = pmod(col("s_suppkey"), lit(2))
    val dirtyEmail = when(m2 === 0,
      concat(lit("  Contact."), col("s_suppkey"), lit("@Example.COM  ")))
      .otherwise(lit("not-an-email"))
    val dirtyPhone = when(m2 === 0,
      concat(lit("(555) 123-"), lpad(pmod(col("s_suppkey"), lit(10000)).cast(StringType), 4, "0"), lit(" ext9")))
      .otherwise(lit("12345"))
    sup.select(
      col("s_suppkey"),
      dirtyName.as("dirty_name"),
      cleanText(dirtyName).as("clean_name"),
      cleanEmail(dirtyEmail).as("clean_email"),
      cleanPhone(dirtyPhone).as("clean_phone"))
      .orderBy(col("s_suppkey"))
  }

  private val cleanSupplierTextSql = {
    val dn = """CASE WHEN s_suppkey % 3 = 0 THEN '  ' || upper(s_name) || '  '
               |            WHEN s_suppkey % 3 = 1 THEN '##' || lower(s_name) || '!!'
               |            ELSE ' ' || s_name || '   extra   spaces ' END""".stripMargin
    val de = """CASE WHEN s_suppkey % 2 = 0 THEN '  Contact.' || s_suppkey || '@Example.COM  '
               |            ELSE 'not-an-email' END""".stripMargin
    val dp = """CASE WHEN s_suppkey % 2 = 0 THEN '(555) 123-' || lpad(CAST(s_suppkey % 10000 AS VARCHAR), 4, '0') || ' ext9'
               |            ELSE '12345' END""".stripMargin
    s"""SELECT s_suppkey, dirty_name, clean_name, clean_email, clean_phone FROM (
       |SELECT s_suppkey,
       |       $dn AS dirty_name,
       |       ${cleanTextSql("dirty_name", "clean_name")},
       |       ${cleanEmailSql(s"($de)")} AS clean_email,
       |       ${cleanPhoneSql(s"($dp)")} AS clean_phone
       |FROM supplier)
       |ORDER BY s_suppkey""".stripMargin
  }

  // ---- q16: order field cleaning (dates, ints, money, status) ----

  /** q16 — multi-format date precedence, integer sign-drop quirk,
    * money extraction, status canonicalization, null sentinels. */
  def cleanOrderFields(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.t(s, dir, "orders")
    val m5 = pmod(col("o_orderkey"), lit(5))
    val dirtyDate = when(m5 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .when(m5 === 1, date_format(col("o_orderdate"), "MM/dd/yyyy"))
      .when(m5 === 2, date_format(col("o_orderdate"), "dd/MM/yyyy"))
      .when(m5 === 3, date_format(col("o_orderdate"), "dd-MM-yyyy"))
      .otherwise(date_format(col("o_orderdate"), "yyyy/MM/dd"))
    val m4 = pmod(col("o_orderkey"), lit(4))
    val dirtyCust = when(m4 === 0, concat(lit(" "), col("o_custkey"), lit(" ")))
      .when(m4 === 1, concat(lit("C-"), col("o_custkey")))
      .when(m4 === 2, concat(lit("-"), col("o_custkey")))
      .otherwise(lit("N/A"))
    val dirtyPrice = when(m4 === 0, concat(lit("$"), col("o_totalprice")))
      .when(m4 === 1, concat(col("o_totalprice"), lit(" USD")))
      .when(m4 === 2, concat(lit("-"), col("o_totalprice")))
      .otherwise(col("o_totalprice").cast(StringType))
    val dirtyStatus = when(col("o_orderstatus") === "F",
      when(m4 === 0, "Completed").when(m4 === 1, "DONE").when(m4 === 2, " fulfilled ").otherwise("mystery-state"))
      .when(col("o_orderstatus") === "O",
        when(m4 === 0, "open").when(m4 === 1, "In Progress").when(m4 === 2, "NEW").otherwise("processing"))
      .otherwise(when(m4 === 0, "In Transit").when(m4 === 1, "dispatched").when(m4 === 2, "SENT").otherwise(lit(null).cast(StringType)))
    o.select(
      col("o_orderkey"),
      parseDateMulti(dirtyDate).as("clean_date"),
      cleanInteger(nullifySentinels(dirtyCust)).as("clean_custkey"),
      // DOUBLE at the output edge: a DECIMAL(15,4) parquet column
      // stringifies as '1.2300' driver-side vs the oracle's '1.23'
      // (decimal(15,4) → double is exact here: scaled int < 2^53)
      cleanDecimal(dirtyPrice).cast(DoubleType).as("clean_price"),
      mapStatus(dirtyStatus, orderStatusMap).as("clean_status"))
      // per-partition sort, not a total order (guide §2.4, the q04 rule)
      .sortWithinPartitions(col("o_orderkey"))
  }

  private val cleanOrderFieldsSql = {
    val dd = """CASE WHEN o_orderkey % 5 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
               |     WHEN o_orderkey % 5 = 1 THEN strftime(o_orderdate, '%m/%d/%Y')
               |     WHEN o_orderkey % 5 = 2 THEN strftime(o_orderdate, '%d/%m/%Y')
               |     WHEN o_orderkey % 5 = 3 THEN strftime(o_orderdate, '%d-%m-%Y')
               |     ELSE strftime(o_orderdate, '%Y/%m/%d') END""".stripMargin
    val dc = """CASE WHEN o_orderkey % 4 = 0 THEN ' ' || o_custkey || ' '
               |     WHEN o_orderkey % 4 = 1 THEN 'C-' || o_custkey
               |     WHEN o_orderkey % 4 = 2 THEN '-' || o_custkey
               |     ELSE 'N/A' END""".stripMargin
    val dcSent = s"CASE WHEN upper(trim(dirty_cust)) IN ('NULL','N/A','NOT AVAILABLE','TBD','UNKNOWN','','NONE','NIL') THEN NULL ELSE dirty_cust END"
    val dp = """CASE WHEN o_orderkey % 4 = 0 THEN '$' || CAST(o_totalprice AS VARCHAR)
               |     WHEN o_orderkey % 4 = 1 THEN CAST(o_totalprice AS VARCHAR) || ' USD'
               |     WHEN o_orderkey % 4 = 2 THEN '-' || CAST(o_totalprice AS VARCHAR)
               |     ELSE CAST(o_totalprice AS VARCHAR) END""".stripMargin
    val ds = """CASE WHEN o_orderstatus = 'F' THEN
               |       CASE WHEN o_orderkey % 4 = 0 THEN 'Completed' WHEN o_orderkey % 4 = 1 THEN 'DONE'
               |            WHEN o_orderkey % 4 = 2 THEN ' fulfilled ' ELSE 'mystery-state' END
               |     WHEN o_orderstatus = 'O' THEN
               |       CASE WHEN o_orderkey % 4 = 0 THEN 'open' WHEN o_orderkey % 4 = 1 THEN 'In Progress'
               |            WHEN o_orderkey % 4 = 2 THEN 'NEW' ELSE 'processing' END
               |     ELSE
               |       CASE WHEN o_orderkey % 4 = 0 THEN 'In Transit' WHEN o_orderkey % 4 = 1 THEN 'dispatched'
               |            WHEN o_orderkey % 4 = 2 THEN 'SENT' ELSE NULL END END""".stripMargin
    s"""SELECT o_orderkey, clean_date, clean_custkey, CAST(clean_price AS DOUBLE) AS clean_price, clean_status FROM (
       |SELECT o_orderkey,
       |       ($dd) AS dirty_date,
       |       ($dc) AS dirty_cust,
       |       ($dp) AS dirty_price,
       |       ($ds) AS dirty_status,
       |       ${parseDateSql("dirty_date")} AS clean_date,
       |       ${cleanIntegerSql(s"($dcSent)")} AS clean_custkey,
       |       ${cleanDecimalSql("dirty_price")} AS clean_price,
       |       ${mapStatusSql("dirty_status")} AS clean_status
       |FROM orders)
       |ORDER BY o_orderkey""".stripMargin
  }

  // ---- q17: rejection split + DQ flags + quality score -----------

  /** q17 — P6 essential-field rejection + DQ flags (calc-correct,
    * date-logic) + per-row quality score, over lineitem⋈orders with
    * seeded dirt. Clean/rejected stay one DataFrame with is_rejected +
    * reason — the split is a filter on either side (reference keeps a
    * rejected_rows audit table, silver/silver_builder.py:456-475). */
  def rejectionSplit(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.t(s, dir, "lineitem")
    val o = Tables.t(s, dir, "orders")
    val key = col("l_orderkey") * lit(10) + col("l_linenumber")
    val dirtyQty = when(pmod(key, lit(7)) === 0, lit("N/A"))
      .when(pmod(key, lit(7)) === 1, concat(lit("-"), col("l_quantity").cast(IntegerType)))
      .otherwise(col("l_quantity").cast(IntegerType).cast(StringType))
    val dirtyShip = when(pmod(key, lit(11)) === 0, lit("TBD"))
      .otherwise(date_format(col("l_shipdate"), "yyyy-MM-dd"))
    val invoice = when(pmod(key, lit(13)) === 0,
      moneyRound(col("l_extendedprice") + lit(0.02)))
      .otherwise(col("l_extendedprice"))
    val unitPrice = col("l_extendedprice") / col("l_quantity")
    val cleanQty = cleanInteger(nullifySentinels(dirtyQty))
    val cleanShip = parseDateMulti(dirtyShip)
    val rejectReason = concat_ws("; ",
      when(cleanQty.isNull, lit("missing_quantity")),
      when(cleanShip.isNull, lit("unparseable_ship_date")))
    val issues = cleanQty.isNull.cast(IntegerType) + cleanShip.isNull.cast(IntegerType)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        cleanQty.as("clean_quantity"),
        cleanShip.as("clean_ship_date"),
        (cleanQty.isNull || cleanShip.isNull).as("is_rejected"),
        when(rejectReason === "", lit(null).cast(StringType)).otherwise(rejectReason).as("reject_reason"),
        calcCorrect(invoice, col("l_quantity"), unitPrice).as("is_calculation_correct"),
        dateLogicValid(col("o_orderdate").cast(DateType), cleanShip,
          date_add(cleanShip, 3)).as("date_logic_valid"),
        qualityScore(issues, 4).as("quality_score"))
      // per-partition sort, not a total order (guide §2.4, the q04
      // rule): the range exchange's sampling pass would re-run the
      // regex-heavy cleaning projection over the whole fact a second
      // time; the compare gates are row-order-insensitive
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
  }

  private val rejectionSplitSql = {
    val key = "(l_orderkey * 10 + l_linenumber)"
    s"""SELECT l_orderkey, l_linenumber, clean_quantity, clean_ship_date,
       |       (clean_quantity IS NULL OR clean_ship_date IS NULL) AS is_rejected,
       |       nullif(concat_ws('; ',
       |         CASE WHEN clean_quantity IS NULL THEN 'missing_quantity' END,
       |         CASE WHEN clean_ship_date IS NULL THEN 'unparseable_ship_date' END), '') AS reject_reason,
       |       abs(dirty_invoice - l_quantity * (l_extendedprice / l_quantity)) <= 0.01 AS is_calculation_correct,
       |       (coalesce(clean_ship_date >= CAST(o_orderdate AS DATE), TRUE)
       |         AND coalesce(clean_ship_date + 3 >= clean_ship_date, TRUE)) AS date_logic_valid,
       |       ${snapRoundSql(s"CAST(4 - (CASE WHEN clean_quantity IS NULL THEN 1 ELSE 0 END + CASE WHEN clean_ship_date IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / 4.0 * 100.0")} AS quality_score
       |FROM (
       |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, o_orderdate,
       |         ${cleanIntegerSql(s"""(CASE WHEN upper(trim(dirty_qty)) IN ('NULL','N/A','NOT AVAILABLE','TBD','UNKNOWN','','NONE','NIL') THEN NULL ELSE dirty_qty END)""")} AS clean_quantity,
       |         ${parseDateSql("dirty_ship")} AS clean_ship_date,
       |         dirty_invoice
       |  FROM (
       |    SELECT *,
       |           CASE WHEN $key % 7 = 0 THEN 'N/A'
       |                WHEN $key % 7 = 1 THEN '-' || CAST(CAST(l_quantity AS INTEGER) AS VARCHAR)
       |                ELSE CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) END AS dirty_qty,
       |           CASE WHEN $key % 11 = 0 THEN 'TBD'
       |                ELSE strftime(l_shipdate, '%Y-%m-%d') END AS dirty_ship,
       |           CASE WHEN $key % 13 = 0 THEN CAST(round(CAST(l_extendedprice + 0.02 AS DECIMAL(18,4)), 2) AS DOUBLE)
       |                ELSE l_extendedprice END AS dirty_invoice
       |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey))
       |ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  // ---- q18: category parsing -------------------------------------

  /** q18 — separator-cascade category split with typo fixes and
    * defaults (silver/silver_builder.py:209-278). */
  def categoryParse(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.t(s, dir, "part")
    val m = pmod(col("p_partkey"), lit(6))
    val dirty = when(m === 0, concat(col("p_brand"), lit(" > "), col("p_type")))
      .when(m === 1, concat(col("p_brand"), lit("-"), col("p_type")))
      .when(m === 2, concat(col("p_brand"), lit("|"), col("p_type")))
      .when(m === 3, col("p_brand"))
      .when(m === 4, lit("autmootive > battreies"))
      .otherwise(lit("N/A"))
    val parsed = parseCategory(dirty)
    p.select(
      col("p_partkey"),
      dirty.as("dirty_category"),
      parsed.getField("main_category").as("main_category"),
      parsed.getField("sub_category").as("sub_category"))
      .orderBy(col("p_partkey"))
  }

  private val categoryParseSql = {
    val dirty = """CASE WHEN p_partkey % 6 = 0 THEN p_brand || ' > ' || p_type
                  |     WHEN p_partkey % 6 = 1 THEN p_brand || '-' || p_type
                  |     WHEN p_partkey % 6 = 2 THEN p_brand || '|' || p_type
                  |     WHEN p_partkey % 6 = 3 THEN p_brand
                  |     WHEN p_partkey % 6 = 4 THEN 'autmootive > battreies'
                  |     ELSE 'N/A' END""".stripMargin
    def fix(x: String): String = {
      val cases = categoryTypoFixes.toSeq.map { case (t, c) =>
        s"WHEN lower(trim($x)) = '$t' THEN '$c'"
      }.mkString(" ")
      s"CASE $cases ELSE ${initcapSql(s"lower(trim($x))")} END"
    }
    s"""SELECT p_partkey, dirty_category, main_category, sub_category FROM (
       |SELECT p_partkey, dirty_category,
       |       CASE WHEN sent IS NULL OR trim(raw_main) = '' THEN 'Uncategorized' ELSE ${fix("raw_main")} END AS main_category,
       |       CASE WHEN sent IS NULL OR trim(raw_sub) = '' THEN 'General' ELSE ${fix("raw_sub")} END AS sub_category
       |FROM (
       |  SELECT p_partkey, dirty_category, sent,
       |         CASE WHEN regexp_matches(sent, '[>\\-|/]') THEN regexp_extract(sent, '^([^>\\-|/]*)[>\\-|/]', 1) ELSE sent END AS raw_main,
       |         CASE WHEN regexp_matches(sent, '[>\\-|/]') THEN regexp_extract(sent, '^[^>\\-|/]*[>\\-|/](.*)$$', 1) ELSE '' END AS raw_sub
       |  FROM (
       |    SELECT p_partkey, dirty_category,
       |           CASE WHEN upper(trim(dirty_category)) IN ('NULL','N/A','NOT AVAILABLE','TBD','UNKNOWN','','NONE','NIL')
       |                THEN NULL ELSE trim(dirty_category) END AS sent
       |    FROM (SELECT p_partkey, ($dirty) AS dirty_category FROM part))))
       |ORDER BY p_partkey""".stripMargin
  }

  /** q40 — A6: daily order metrics with P3 regex-guarded casts: dirty
    * string quantities pass a `^[0-9]+$` validity predicate BEFORE the
    * cast (the reference's pre-cast guard pattern,
    * bronze/database_setup.py:223-237); invalid rows counted but
    * excluded from numeric aggregates. */
  def dailyOrderMetrics(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.t(s, dir, "lineitem")
    val key = col("l_orderkey") * lit(10) + col("l_linenumber")
    val dirtyQty = when(pmod(key, lit(7)) === 0, lit("N/A"))
      .when(pmod(key, lit(7)) === 1, concat(lit("-"), col("l_quantity").cast(IntegerType)))
      .otherwise(col("l_quantity").cast(IntegerType).cast(StringType))
    val guarded = when(dirtyQty.rlike("^[0-9]+$"), dirtyQty.cast(IntegerType))
    l.select(col("l_shipdate").cast(DateType).as("ship_date"),
        col("l_returnflag"), guarded.as("qty"), col("l_suppkey"))
      .groupBy(col("ship_date"), col("l_returnflag"))
      .agg(count(lit(1)).as("total_lines"),
        count(col("qty")).as("valid_qty_lines"),
        sum(col("qty")).as("total_qty"),
        (sum(col("qty")).cast(DoubleType) / nullif(count(col("qty")).cast(DoubleType), lit(0.0))).as("avg_qty"),
        countDistinct(col("l_suppkey")).as("distinct_suppliers"))
      .orderBy(col("ship_date"), col("l_returnflag"))
  }

  private val dailyOrderMetricsSql =
    """SELECT ship_date, l_returnflag,
      |       count(1) AS total_lines,
      |       count(qty) AS valid_qty_lines,
      |       CAST(sum(qty) AS BIGINT) AS total_qty,
      |       CAST(sum(qty) AS DOUBLE) / nullif(CAST(count(qty) AS DOUBLE), 0.0) AS avg_qty,
      |       count(DISTINCT l_suppkey) AS distinct_suppliers
      |FROM (
      |  SELECT CAST(l_shipdate AS DATE) AS ship_date, l_returnflag, l_suppkey,
      |         CASE WHEN regexp_matches(dirty_qty, '^[0-9]+$') THEN CAST(dirty_qty AS INTEGER) END AS qty
      |  FROM (
      |    SELECT *,
      |           CASE WHEN (l_orderkey * 10 + l_linenumber) % 7 = 0 THEN 'N/A'
      |                WHEN (l_orderkey * 10 + l_linenumber) % 7 = 1 THEN '-' || CAST(CAST(l_quantity AS INTEGER) AS VARCHAR)
      |                ELSE CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) END AS dirty_qty
      |    FROM lineitem))
      |GROUP BY 1, 2
      |ORDER BY ship_date, l_returnflag""".stripMargin

  /** q41 — A7: store-performance view: dims LEFT-joined to facts so
    * storeless customers survive with NULL metrics, ranked with
    * DESC NULLS LAST (bronze/database_setup.py:240-257). */
  def storePerformance(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.t(s, dir, "customer")
    val o = Tables.t(s, dir, "orders")
    val l = Tables.t(s, dir, "lineitem")
    // aggregate the fact side BEFORE the dimension join (guide §2.3):
    // the per-custkey rollup shrinks 600k joined fact rows to customer
    // cardinality, so the LEFT join attaches a broadcastable aggregate
    // instead of sort-merging the full fact against the dimension and
    // re-aggregating after. Exactly the same values: the decimal
    // revenue sum distributes over the regrouping, count of fact rows
    // per customer becomes the pre-agg count (0 via coalesce for
    // storeless customers, as count over no rows was), and NULL
    // revenue for no-order customers is preserved (no fill).
    val facts = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(col("o_orderkey")).as("fact_lines"),
        derivedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("fact_revenue"))
    c.join(facts, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("fact_lines"), lit(0L)).as("order_lines"),
        col("fact_revenue").as("revenue"))
      .orderBy(col("revenue").desc_nulls_last, col("c_custkey"))
  }

  private val storePerformanceSql =
    """SELECT c_custkey, c_name,
      |       count(o_orderkey) AS order_lines,
      |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(32,4))) AS DOUBLE) AS revenue
      |FROM customer
      |LEFT JOIN (SELECT * FROM orders JOIN lineitem ON o_orderkey = l_orderkey) f
      |  ON c_custkey = f.o_custkey
      |GROUP BY 1, 2
      |ORDER BY revenue DESC NULLS LAST, c_custkey""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_daily_order_metrics" -> dailyOrderMetrics,
    "q41_store_performance" -> storePerformance,
    "q15_clean_supplier_text" -> cleanSupplierText,
    "q16_clean_order_fields" -> cleanOrderFields,
    "q17_rejection_split" -> rejectionSplit,
    "q18_category_parse" -> categoryParse)

  override def oracles: Map[String, String] = Map(
    "q40_daily_order_metrics" -> dailyOrderMetricsSql,
    "q41_store_performance" -> storePerformanceSql,
    "q15_clean_supplier_text" -> cleanSupplierTextSql,
    "q16_clean_order_fields" -> cleanOrderFieldsSql,
    "q17_rejection_split" -> rejectionSplitSql,
    "q18_category_parse" -> categoryParseSql)
}
