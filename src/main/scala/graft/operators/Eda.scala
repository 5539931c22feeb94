package graft.operators

import graft.{QueryModule, Tables}
import graft.util.Parity._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's EDA / profiling surface (eda/supply_chain_eda.py) as
  * distributed one-pass queries: descriptive statistics (A11), Pearson
  * correlation (A12), group-sum top-k (A13), quantile bucketing (A14),
  * value-counts (A15), null/duplicate profiling (A16), cross-layer
  * reconciliation (A17), plus pagination (S11), DISTINCT projection
  * (P5) and the latest-wins upsert semantics (S2) as a window dedup.
  *
  * Determinism: every moment-based statistic (mean/stddev/skew/kurt/
  * corr) is computed from exact DecimalType power sums, then a fixed
  * double formula — so results don't depend on partial-aggregation
  * order (same property that makes them reproducible cluster-wide).
  * The reference computes these with pandas on a single machine
  * (eda/supply_chain_eda.py:686-740); here they are single-pass
  * hash aggregations that scale out.
  */
object Eda extends QueryModule {

  private val dec = DecimalType(38, 8)

  /** q05 — A13/O4: group-sum top-k (reference `nlargest(10)`,
    * eda/supply_chain_eda.py:465). Total order via revenue DESC then
    * key, so ties can't reorder across engines. */
  def topkCustomers(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.t(s, dir, "lineitem")
    val o = Tables.t(s, dir, "orders")
    val c = Tables.t(s, dir, "customer")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(derivedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        countDistinct(col("o_orderkey")).as("orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  private val topkCustomersSql =
    """SELECT c_custkey, c_name,
      |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(32,4))) AS DOUBLE) AS revenue,
      |       count(DISTINCT o_orderkey) AS orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 10""".stripMargin

  /** q06 — S11/O3: LIMIT+OFFSET pagination over a total order
    * (reference DB-explorer scan, app.py:1279-1282). */
  def pagination(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "orders")
      .orderBy(col("o_orderkey"))
      .offset(200)
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").cast(DateType).as("o_orderdate"))

  private val paginationSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |       CAST(o_orderdate AS DATE) AS o_orderdate
      |FROM orders ORDER BY o_orderkey LIMIT 100 OFFSET 200""".stripMargin

  /** q07 — P5: DISTINCT entity projection with NOT NULL + ORDER BY
    * (reference forecasting.py:108-118). */
  def distinctEntities(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "customer")
      .select(col("c_mktsegment"))
      .where(col("c_mktsegment").isNotNull)
      .distinct()
      .orderBy(col("c_mktsegment"))

  private val distinctEntitiesSql =
    """SELECT DISTINCT c_mktsegment FROM customer
      |WHERE c_mktsegment IS NOT NULL ORDER BY c_mktsegment""".stripMargin

  /** q08 — A15: value-counts histograms across two tables, tagged and
    * unioned (reference value_counts(), eda/supply_chain_eda.py:378-399).
    * Set-op surface: the reference has none (§2.7); unionByName here. */
  def valueCounts(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.t(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("value")).count()
      .withColumn("source_column", lit("orders.o_orderstatus"))
    val l = Tables.t(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("value")).count()
      .withColumn("source_column", lit("lineitem.l_returnflag"))
    o.unionByName(l)
      .select(col("source_column"), col("value"), col("count"))
      .orderBy(col("source_column"), col("value"))
  }

  private val valueCountsSql =
    """SELECT * FROM (
      |  SELECT 'orders.o_orderstatus' AS source_column, o_orderstatus AS value, count(*) AS count
      |  FROM orders GROUP BY 2
      |  UNION ALL
      |  SELECT 'lineitem.l_returnflag' AS source_column, l_returnflag AS value, count(*) AS count
      |  FROM lineitem GROUP BY 2)
      |ORDER BY source_column, value""".stripMargin

  /** q09 — A16: per-column null counts + whole-row duplicate count
    * (reference isnull().sum() / duplicated().sum(),
    * eda/supply_chain_eda.py:141-152,678-683). One pass, no collect. */
  def nullProfile(s: SparkSession, dir: String): DataFrame =
    nullProfileOver(Tables.t(s, dir, "lineitem"))

  /** The profiling core, with an opt-in `approx = kmv` dial for the
    * duplicate-pair counter. Exact mode (the q09 oracle surface)
    * shuffles every distinct (partkey, suppkey) pair for the
    * countDistinct — correct, but at corpus scale the distinct state
    * is the pair cardinality. KMV mode swaps it for the mergeable
    * k-minimum-values sketch (graft.functions.Kmv): aggregation state
    * caps at K hashes per partition, the estimate is cross-engine
    * DETERMINISTIC (unlike approx_count_distinct's engine-specific
    * HLL layout — ScaleSpec's documented tolerance path), exact below
    * K distinct pairs, and within ≈1/sqrt(K−2) relative error above
    * (bound proven in ScaleSpec on sf0.01). Same output schema; the
    * dup count becomes (pairs − round(estimate)). */
  def nullProfileOver(l: DataFrame, approxKmv: Boolean = false,
      k: Int = graft.functions.Kmv.DefaultK): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_shipdate")
    val nulls = cols.map(c => count(when(col(c).isNull, 1)).as(s"nulls_$c"))
    // NULL-guarded both-sides: Spark countDistinct(a,b) skips rows where
    // EITHER key is NULL while DuckDB count(DISTINCT (a,b)) counts the
    // struct — restrict both engines to rows where both keys are set.
    val bothSet = col("l_partkey").isNotNull && col("l_suppkey").isNotNull
    if (!approxKmv) {
      val pairDups = (count(when(bothSet, 1)) -
        countDistinct(when(bothSet, struct(col("l_partkey"), col("l_suppkey")))))
        .as("dup_part_supp_pairs")
      l.agg(nulls.head, (nulls.tail :+ pairDups :+ count(lit(1)).as("total_rows")): _*)
    } else {
      val base = l.agg(nulls.head,
        (nulls.tail :+ count(when(bothSet, 1)).as("pairs_total")
          :+ count(lit(1)).as("total_rows")): _*)
      // \u0001 separator: unambiguous pair encoding (a bare concat
      // would collide (12,3) with (1,23))
      val est = graft.functions.Kmv.sketch(
        l.filter(bothSet),
        concat_ws("\u0001", col("l_partkey").cast(StringType),
          col("l_suppkey").cast(StringType)), k)
        .select(round(graft.functions.Kmv.estimate(col("minima"), k))
          .cast(LongType).as("distinct_pairs_est"))
      // 1-row × 1-row — the allow-listed scalar-frame crossJoin shape
      base.crossJoin(est)
        .select((cols.map(c => col(s"nulls_$c")) :+
          greatest(col("pairs_total") - col("distinct_pairs_est"), lit(0L))
            .as("dup_part_supp_pairs") :+
          col("total_rows")): _*)
    }
  }

  private val nullProfileSql =
    """SELECT count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS nulls_l_orderkey,
      |       count(CASE WHEN l_partkey IS NULL THEN 1 END) AS nulls_l_partkey,
      |       count(CASE WHEN l_suppkey IS NULL THEN 1 END) AS nulls_l_suppkey,
      |       count(CASE WHEN l_quantity IS NULL THEN 1 END) AS nulls_l_quantity,
      |       count(CASE WHEN l_extendedprice IS NULL THEN 1 END) AS nulls_l_extendedprice,
      |       count(CASE WHEN l_returnflag IS NULL THEN 1 END) AS nulls_l_returnflag,
      |       count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS nulls_l_shipdate,
      |       count(CASE WHEN l_partkey IS NOT NULL AND l_suppkey IS NOT NULL THEN 1 END)
      |         - count(DISTINCT CASE WHEN l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
      |                               THEN (l_partkey, l_suppkey) END) AS dup_part_supp_pairs,
      |       count(1) AS total_rows
      |FROM lineitem""".stripMargin

  /** q19 — J5: type-coercing equi-join (INT↔TEXT key, like the
    * reference's CAST(rs.retail_store_id AS TEXT) = so.retail_store_id,
    * bronze/database_setup.py:251), LEFT, with COALESCE default.
    * Scale note: a cast on the join key defeats bucketing/pruning on
    * that side — acceptable for dim-sized inputs, never for two facts. */
  def castJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.t(s, dir, "customer")
    val n = Tables.t(s, dir, "nation")
    c.join(broadcast(n), col("c_nationkey").cast(StringType) === col("n_nationkey").cast(StringType), "left")
      .groupBy(coalesce(col("n_name"), lit("Unknown")).as("nation"))
      .agg(count(lit(1)).as("customers"),
        moneySum(col("c_acctbal")).as("total_balance"))
      .orderBy(col("nation"))
  }

  private val castJoinSql =
    """SELECT coalesce(n_name, 'Unknown') AS nation, count(1) AS customers,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_balance
      |FROM customer LEFT JOIN nation
      |  ON CAST(c_nationkey AS VARCHAR) = CAST(n_nationkey AS VARCHAR)
      |GROUP BY 1 ORDER BY nation""".stripMargin

  /** q47 — semi/anti joins (EXISTS / NOT EXISTS): per segment, how
    * many customers have high-value orders vs none at all. The
    * reference never uses them (SURVEY §2.3 'Absent'); they are the
    * backbone of our upsert (left_anti) and any incremental pipeline.
    * left_semi/left_anti never duplicate or widen rows — at scale
    * that's the difference between this and an inner-join + distinct. */
  def semiAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.t(s, dir, "customer")
    val bigOrders = Tables.t(s, dir, "orders").filter(col("o_totalprice") > 200000)
    val withBig = c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("customers_with_big_orders"))
    val without = c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("customers_without_big_orders"))
    withBig.join(without, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("customers_with_big_orders"), lit(0L)).as("customers_with_big_orders"),
        coalesce(col("customers_without_big_orders"), lit(0L)).as("customers_without_big_orders"))
      .orderBy(col("c_mktsegment"))
  }

  private val semiAntiJoinSql =
    """WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
      |w AS (SELECT c_mktsegment, count(1) AS customers_with_big_orders
      |      FROM customer WHERE EXISTS (SELECT 1 FROM big WHERE o_custkey = c_custkey)
      |      GROUP BY 1),
      |wo AS (SELECT c_mktsegment, count(1) AS customers_without_big_orders
      |       FROM customer WHERE NOT EXISTS (SELECT 1 FROM big WHERE o_custkey = c_custkey)
      |       GROUP BY 1)
      |SELECT c_mktsegment,
      |       coalesce(customers_with_big_orders, 0) AS customers_with_big_orders,
      |       coalesce(customers_without_big_orders, 0) AS customers_without_big_orders
      |FROM w FULL OUTER JOIN wo USING (c_mktsegment)
      |ORDER BY c_mktsegment""".stripMargin

  /** q42 — A11's categorical piece: per-column mode via
    * groupBy-count + rank, deterministic tiebreak on the value itself
    * (engine mode() builtins tiebreak differently — the explicit
    * window is portable). */
  def categoricalMode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = Tables.t(s, dir, "lineitem")
    val o = Tables.t(s, dir, "orders")
    val counted = l.groupBy(lit("l_returnflag").as("column_name"), col("l_returnflag").as("value")).count()
      .unionByName(l.groupBy(lit("l_linestatus").as("column_name"), col("l_linestatus").as("value")).count())
      .unionByName(o.groupBy(lit("o_orderpriority").as("column_name"), col("o_orderpriority").as("value")).count())
    val w = Window.partitionBy(col("column_name")).orderBy(col("count").desc, col("value"))
    counted.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("column_name"), col("value").as("mode_value"), col("count").as("mode_count"))
      .orderBy(col("column_name"))
  }

  private val categoricalModeSql =
    """SELECT column_name, value AS mode_value, count AS mode_count FROM (
      |  SELECT *, row_number() OVER (PARTITION BY column_name ORDER BY count DESC, value) AS rn
      |  FROM (
      |    SELECT 'l_returnflag' AS column_name, l_returnflag AS value, count(*) AS count FROM lineitem GROUP BY 2
      |    UNION ALL
      |    SELECT 'l_linestatus', l_linestatus, count(*) FROM lineitem GROUP BY 2
      |    UNION ALL
      |    SELECT 'o_orderpriority', o_orderpriority, count(*) FROM orders GROUP BY 2))
      |WHERE rn = 1 ORDER BY column_name""".stripMargin

  /** Per-column aggregate + post-aggregate expressions for the
    * one-pass stats profile: n, nulls, Σx..Σx⁴ EXACT, min/max, and ONE
    * exact-percentile buffer per column (percentile with an array of
    * fractions sorts the column once for all three quantiles).
    *
    * Exactness without BigDecimal in the hot loop: every profiled
    * column is fixed-point (quantity integer; money/rates 2 dp), so
    * power sums are exact LONG sums of 10^k-scaled values wherever the
    * scaled range fits 64 bits — codegen'd long adds, ~10× cheaper
    * than Decimal(38,8) accumulation (measured 8.8 s → <1 s for the 16
    * sums at sf0.1). Only l_extendedprice's Σx³/Σx⁴ (per-row scaled
    * values ≥ 1e21 exceed 64 bits) stay decimal; its Σx² splits each
    * v² into two long limbs (hi = v² div 1e9, lo = v² mod 1e9, both
    * long-summable to ~9e9 rows) recombined exactly after the
    * aggregate. Descaling runs in DECIMAL so the final double equals
    * the oracle's CAST(exact-decimal AS DOUBLE) bit for bit — a
    * long-sum divided by 10^k in binary64 would double-round. */
  private def descale(c: Column, pow: Int): Column =
    if (pow == 0) c.cast(DoubleType)
    else (c.cast(DecimalType(28, 0)) *
      lit(new java.math.BigDecimal(java.math.BigInteger.ONE, pow))).cast(DoubleType)

  private def momentAggs(c: String): (Seq[Column], Seq[Column]) = {
    val x = col(c).cast(DoubleType)
    val shared = Seq(
      count(col(c)).as(s"n_$c"),
      (count(lit(1)) - count(col(c))).as(s"nulls_$c"),
      min(x).as(s"min_$c"),
      max(x).as(s"max_$c"))
    if (c == "l_extendedprice") {
      val v = round(x * 100).cast(LongType) // cents <= 1e7, exact
      val v2 = v * v                        // <= 1e14, exact long
      val aggs = shared ++ Seq(sum(v).as(s"r1_$c")) ++
        limbSquareAggs(v2, c) ++ Seq(
        sum((x * x * x).cast(dec)).as(s"d3_$c"),
        sum((x * x * x * x).cast(dec)).as(s"d4_$c"))
      val post = Seq(
        descale(col(s"r1_$c"), 2).as(s"s1_$c"),
        (limbSquareSum(c) *
          lit(new java.math.BigDecimal(java.math.BigInteger.ONE, 4)))
          .cast(DoubleType).as(s"s2_$c"),
        col(s"d3_$c").cast(DoubleType).as(s"s3_$c"),
        col(s"d4_$c").cast(DoubleType).as(s"s4_$c"))
      (aggs, post)
    } else {
      // quantity: integer-valued (pow 0); discount/tax: 2-dp <= 0.10
      val pow = if (c == "l_quantity") 0 else 2
      val v = (if (pow == 0) round(x) else round(x * 100)).cast(LongType)
      val aggs = shared ++ Seq(
        sum(v).as(s"r1_$c"), sum(v * v).as(s"r2_$c"),
        sum(v * v * v).as(s"r3_$c"), sum(v * v * v * v).as(s"r4_$c"))
      val post = (1 to 4).map(k =>
        descale(col(s"r$k" + s"_$c"), pow * k).as(s"s${k}_$c"))
      (aggs, post)
    }
  }

  /** Derived statistics over the unpivoted (one row per column) sums. */
  private def deriveMoments(row: DataFrame): DataFrame = {
    val m1 = col("s1").cast(DoubleType) / col("n") // population mean
    val m2 = col("s2").cast(DoubleType) / col("n") - m1 * m1 // population variance
    row.select(
        col("column_name"), col("n"), col("nulls"),
        col("min_value"), col("max_value"), col("distinct_count"),
        col("q25"), col("median"), col("q75"),
        snapRound(m1, 6).as("mean"),
        snapRound(sqrt((col("s2").cast(DoubleType) - col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / col("n")) / (col("n") - lit(1))), 6).as("stddev"),
        // population moments for skew/kurtosis — textbook formulas over
        // the hoisted m1/m2 subexpressions (identical trees to the
        // previous inline spelling, so IEEE-identical values);
        // sqrt(m2)*m2 (not pow) keeps it IEEE-deterministic
        ((col("s3").cast(DoubleType) / col("n")
          - lit(3.0) * m1 * (col("s2").cast(DoubleType) / col("n"))
          + lit(2.0) * m1 * m1 * m1)
          / (sqrt(m2) * m2)).as("skew_raw"),
        // excess kurtosis m4/m2^2 - 3 from the same exact power sums
        ((col("s4").cast(DoubleType) / col("n")
          - lit(4.0) * m1 * (col("s3").cast(DoubleType) / col("n"))
          + lit(6.0) * m1 * m1 * (col("s2").cast(DoubleType) / col("n"))
          - lit(3.0) * m1 * m1 * m1 * m1)
          / (m2 * m2)
          - lit(3.0)).as("kurt_raw"))
      .withColumn("skewness", snapRound(col("skew_raw"), 9))
      .withColumn("kurtosis", snapRound(col("kurt_raw"), 9))
      .drop("skew_raw", "kurt_raw")
  }

  private def momentStatsSql(c: String): String =
    s"""SELECT '$c' AS column_name, n, nulls, min_value, max_value, distinct_count,
       |       q25, median, q75,
       |       CAST(round(CAST(s1 / n AS DECIMAL(30,10)), 6) AS DOUBLE) AS mean,
       |       CAST(round(CAST(sqrt((s2 - s1 * s1 / n) / (n - 1)) AS DECIMAL(30,10)), 6) AS DOUBLE) AS stddev,
       |       CAST(round(CAST((s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
       |         / (sqrt(s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) AS DECIMAL(30,13)), 9) AS DOUBLE) AS skewness,
       |       CAST(round(CAST((s4 / n - 4.0 * (s1 / n) * (s3 / n) + 6.0 * (s1 / n) * (s1 / n) * (s2 / n) - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
       |         / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3.0 AS DECIMAL(30,13)), 9) AS DOUBLE) AS kurtosis
       |FROM (SELECT count($c) AS n, count(1) - count($c) AS nulls,
       |             CAST(sum(CAST($c AS DECIMAL(38,8))) AS DOUBLE) AS s1,
       |             CAST(sum(CAST($c * $c AS DECIMAL(38,8))) AS DOUBLE) AS s2,
       |             CAST(sum(CAST($c * $c * $c AS DECIMAL(38,8))) AS DOUBLE) AS s3,
       |             CAST(sum(CAST($c * $c * $c * $c AS DECIMAL(38,8))) AS DOUBLE) AS s4,
       |             min($c) AS min_value, max($c) AS max_value,
       |             count(DISTINCT $c) AS distinct_count,
       |             quantile_cont($c, 0.25) AS q25,
       |             quantile_cont($c, 0.5) AS median,
       |             quantile_cont($c, 0.75) AS q75
       |      FROM lineitem)""".stripMargin

  /** q10 — A11: descriptive-statistics profile of the fact table's
    * numeric columns, one row per column — TWO scan/aggregation passes
    * for all four columns (the unioned-aggregates form scanned the
    * fact 4× with 3 percentile buffers per column). The distinct
    * counts run in their own pass: fusing 4 countDistincts with the
    * percentile buffers makes the multi-distinct Expand push 5× the
    * rows through every percentile aggregate (measured 1.7× slower
    * than the naive form). */
  def statsProfile(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.t(s, dir, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val (aggSeqs, postSeqs) = cols.map(momentAggs).unzip
    val aggs = aggSeqs.flatten
    // one single-distinct aggregate per column, not 4 countDistincts in
    // one agg: multiple distinct aggregates plan an Expand that pushes
    // 4× the fact through the shuffle; separately each is a partial
    // (map-side) distinct over ONE pruned column, and the 4 one-row
    // results cross-join for free
    val dcs = cols.map(c =>
      l.select(col(c)).agg(countDistinct(col(c)).as(s"dc_$c")))
    // each EXACT percentile is its own single-column branch, not a
    // column of the main aggregate: the final merge of a percentile
    // buffer sorts every value in ONE task, so four of them in one
    // agg serialized four 600k-value sorts behind each other — as
    // separate crossJoined branches the four final merges run as
    // parallel stages (guide §2.6), and each branch's map side scans
    // only its own pruned column
    val pcs = cols.map(c =>
      l.select(col(c)).agg(
        expr(s"percentile($c, array(0.25D, 0.5D, 0.75D))").as(s"pct_$c")))
    val one = (dcs ++ pcs).foldLeft(
      l.agg(aggs.head, aggs.tail: _*).select(col("*") +: postSeqs.flatten: _*))(
      _ crossJoin _)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column_name"), col(s"n_$c").as("n"), col(s"nulls_$c").as("nulls"),
        col(s"min_$c").as("min_value"), col(s"max_$c").as("max_value"),
        col(s"dc_$c").as("distinct_count"),
        element_at(col(s"pct_$c"), 1).as("q25"),
        element_at(col(s"pct_$c"), 2).as("median"),
        element_at(col(s"pct_$c"), 3).as("q75"),
        col(s"s1_$c").as("s1"), col(s"s2_$c").as("s2"),
        col(s"s3_$c").as("s3"), col(s"s4_$c").as("s4"))
    }
    deriveMoments(one.select(explode(array(rows: _*)).as("r")).select(col("r.*")))
      .orderBy(col("column_name"))
  }

  private val statsProfileSql =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(momentStatsSql)
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY column_name")

  /** q11 — A12: Pearson correlation for all numeric column pairs,
    * from exact co-moment sums (reference eda/supply_chain_eda.py:604-641;
    * its pandas .corr() becomes one distributed pass).
    *
    * ONE aggregation computes every sum the 6 pairs need (the per-pair
    * form scanned the fact 6×; measured 25 s → ~3 s at sf0.1). r is
    * scale-invariant, so both engines work on 10^k-scaled LONG values:
    * exact codegen'd long sums here (DuckDB sums BIGINT into HUGEINT,
    * also exact), identical doubles at the formula edge. Only
    * l_extendedprice² exceeds 64 bits in aggregate — its per-row v²
    * (≤1.1e14) splits into two long limbs recombined in decimal after
    * the aggregate, exact to ~9e9 rows; every other scaled sum is
    * bounded by ~6e13 per 6e5 rows, i.e. safe past 1e10 rows. */
  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // complete-case (listwise) deletion: the single n must describe the
    // same rows as every sum, or a NULL in any column makes the moments
    // inconsistent (r can even leave [-1, 1]). Documented deviation
    // from pandas' PAIRWISE-complete .corr(): the two differ only when
    // different columns have different null rows; the oracle applies
    // the identical predicate.
    val l = Tables.t(s, dir, "lineitem")
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
    val sc: Map[String, Column] = Map(
      "l_quantity" -> asScaled(col("l_quantity"), 0),
      "l_extendedprice" -> asScaled(col("l_extendedprice"), 2),
      "l_discount" -> asScaled(col("l_discount"), 2),
      "l_tax" -> asScaled(col("l_tax"), 2))
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (cols(i), cols(j))
    val extV2 = sc("l_extendedprice") * sc("l_extendedprice")
    val aggs =
      Seq(count(lit(1)).cast(DoubleType).as("n")) ++
      cols.map(c => sum(sc(c)).cast(DoubleType).as(s"sx_$c")) ++
      cols.filter(_ != "l_extendedprice")
        .map(c => sum(sc(c) * sc(c)).cast(DoubleType).as(s"sxx_$c")) ++
      limbSquareAggs(extV2, "ext") ++
      pairs.map { case (a, b) => sum(sc(a) * sc(b)).cast(DoubleType).as(s"sxy_${a}_$b") }
    val one = l.agg(aggs.head, aggs.tail: _*)
      .withColumn("sxx_l_extendedprice",
        limbSquareSum("ext").cast(DoubleType))
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("n").as("n"),
        col(s"sx_$a").as("sx"), col(s"sx_$b").as("sy"),
        col(s"sxx_$a").as("sxx"), col(s"sxx_$b").as("syy"),
        col(s"sxy_${a}_$b").as("sxy"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .select(col("col_a"), col("col_b"),
        snapRound((col("n") * col("sxy") - col("sx") * col("sy"))
          / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
            * sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 9).as("pearson_r"))
      .orderBy(col("col_a"), col("col_b"))
  }

  private val corrMatrixSql = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val scSql = Map(
      "l_quantity" -> "CAST(round(l_quantity) AS BIGINT)",
      "l_extendedprice" -> "CAST(round(l_extendedprice * 100) AS BIGINT)",
      "l_discount" -> "CAST(round(l_discount * 100) AS BIGINT)",
      "l_tax" -> "CAST(round(l_tax * 100) AS BIGINT)")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (cols(i), cols(j))
    val scaled = cols.map(c => s"${scSql(c)} AS x_$c").mkString(", ")
    val sums = (
      Seq("CAST(count(1) AS DOUBLE) AS n") ++
      cols.map(c => s"CAST(sum(x_$c) AS DOUBLE) AS sx_$c") ++
      cols.map(c => s"CAST(sum(x_$c * x_$c) AS DOUBLE) AS sxx_$c") ++
      pairs.map { case (a, b) => s"CAST(sum(x_$a * x_$b) AS DOUBLE) AS sxy_${a}_$b" }
      ).mkString(",\n             ")
    val rows = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |       CAST(round(CAST((n * sxy_${a}_$b - sx_$a * sx_$b) / (sqrt(n * sxx_$a - sx_$a * sx_$a) * sqrt(n * sxx_$b - sx_$b * sx_$b)) AS DECIMAL(30,13)), 9) AS DOUBLE) AS pearson_r
         |FROM s""".stripMargin
    }.mkString("\nUNION ALL\n")
    val complete = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    s"""WITH s AS (
       |  SELECT $sums
       |  FROM (SELECT $scaled FROM lineitem WHERE $complete))
       |SELECT * FROM (
       |$rows
       |) ORDER BY col_a, col_b""".stripMargin
  }

  /** q12 — A14: quantile bucketing — exact q25/q75 then a Low/Medium/
    * High CASE ladder with bucket counts (reference pd.cut,
    * eda/supply_chain_eda.py:553-558). */
  def quantileBuckets(s: SparkSession, dir: String): DataFrame =
    quantileBucketsOver(Tables.t(s, dir, "lineitem"))

  /** The bucketing core, with an opt-in `approx = sample` dial for
    * the threshold computation. Exact mode (the q12 oracle surface)
    * computes interpolated q25/q75 via `percentile` — a full sort of
    * the column's values per aggregation state. Sample mode swaps the
    * thresholds for nearest-rank quantiles over the mergeable
    * bottom-k hash sample (graft.functions.HashSample, the q88
    * sketch): threshold state caps at K rows per partition, the
    * thresholds are cross-engine DETERMINISTIC (unlike
    * approx_percentile's engine-specific KLL sketch), and land within
    * ~1/sqrt(K) of the exact thresholds in rank space (DKW — bound
    * proven in HashSampleSpec). Same output schema; the bucket COUNTS
    * still scan every row, only the cutoffs come from the sample. */
  def quantileBucketsOver(l: DataFrame, approxSample: Boolean = false,
      k: Int = graft.functions.HashSample.DefaultK): DataFrame = {
    val q =
      if (!approxSample)
        l.agg(
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.75)").as("q75"))
      else {
        val hs = graft.functions.HashSample
        hs.sketch(l,
          concat(col("l_orderkey").cast(StringType), lit("|"),
            col("l_linenumber").cast(StringType)),
          col("l_quantity"), k)
          .select(hs.quantile(col("pairs"), lit(0.25)).as("q25"),
            hs.quantile(col("pairs"), lit(0.75)).as("q75"))
      }
    l.crossJoin(broadcast(q))
      .select(when(col("l_quantity") <= col("q25"), "Low")
        .when(col("l_quantity") <= col("q75"), "Medium")
        .otherwise("High").as("bucket"))
      .groupBy(col("bucket")).count()
      .orderBy(col("bucket"))
  }

  private val quantileBucketsSql =
    """SELECT bucket, count(*) AS count FROM (
      |  SELECT CASE WHEN l_quantity <= (SELECT quantile_cont(l_quantity, 0.25) FROM lineitem) THEN 'Low'
      |              WHEN l_quantity <= (SELECT quantile_cont(l_quantity, 0.75) FROM lineitem) THEN 'Medium'
      |              ELSE 'High' END AS bucket
      |  FROM lineitem)
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  /** q13 — A17: cross-layer reconciliation — detail-layer totals vs
    * aggregated-mart totals with pct-diff and a 5% tolerance verdict
    * (reference eda/supply_chain_eda.py:818-888). Exact decimal sums
    * make the comparison itself exact. */
  def reconciliation(s: SparkSession, dir: String): DataFrame = {
    val silver = Tables.t(s, dir, "lineitem")
      .join(Tables.t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus").isin("F", "O"))
      .agg(derivedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("silver_revenue"),
        moneySum(col("l_quantity")).as("silver_quantity"))
    val gold = GoldMarts.monthlySales(s, dir)
      .agg(sum(col("total_revenue").cast(dec)).cast(DoubleType).as("gold_revenue"),
        sum(col("total_quantity").cast(dec)).cast(DoubleType).as("gold_quantity"))
    silver.crossJoin(gold)
      .withColumn("revenue_pct_diff",
        snapRound(abs(col("silver_revenue") - col("gold_revenue")) / nullif(col("silver_revenue"), lit(0.0)) * lit(100.0), 6))
      .withColumn("quantity_pct_diff",
        snapRound(abs(col("silver_quantity") - col("gold_quantity")) / nullif(col("silver_quantity"), lit(0.0)) * lit(100.0), 6))
      .withColumn("within_tolerance",
        col("revenue_pct_diff") <= 5.0 && col("quantity_pct_diff") <= 5.0)
  }

  private val reconciliationSql =
    """WITH silver AS (
      |  SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(32,4))) AS DOUBLE) AS silver_revenue,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS silver_quantity
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus IN ('F', 'O')),
      |gold AS (
      |  SELECT CAST(sum(CAST(total_revenue AS DECIMAL(38,8))) AS DOUBLE) AS gold_revenue,
      |         CAST(sum(CAST(total_quantity AS DECIMAL(38,8))) AS DOUBLE) AS gold_quantity
      |  FROM (SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(32,4))) AS DOUBLE) AS total_revenue,
      |               CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS total_quantity
      |        FROM lineitem
      |        JOIN orders   ON l_orderkey = o_orderkey
      |        JOIN part     ON l_partkey = p_partkey
      |        JOIN customer ON o_custkey = c_custkey
      |        JOIN nation   ON c_nationkey = n_nationkey
      |        JOIN region   ON n_regionkey = r_regionkey
      |        WHERE o_orderstatus IN ('F', 'O')
      |        GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE), r_name, c_mktsegment, p_brand))
      |SELECT silver_revenue, silver_quantity, gold_revenue, gold_quantity,
      |       CAST(round(CAST(abs(silver_revenue - gold_revenue) / nullif(silver_revenue, 0.0) * 100.0 AS DECIMAL(30,10)), 6) AS DOUBLE) AS revenue_pct_diff,
      |       CAST(round(CAST(abs(silver_quantity - gold_quantity) / nullif(silver_quantity, 0.0) * 100.0 AS DECIMAL(30,10)), 6) AS DOUBLE) AS quantity_pct_diff,
      |       CAST(round(CAST(abs(silver_revenue - gold_revenue) / nullif(silver_revenue, 0.0) * 100.0 AS DECIMAL(30,10)), 6) AS DOUBLE) <= 5.0
      |         AND CAST(round(CAST(abs(silver_quantity - gold_quantity) / nullif(silver_quantity, 0.0) * 100.0 AS DECIMAL(30,10)), 6) AS DOUBLE) <= 5.0 AS within_tolerance
      |FROM silver, gold""".stripMargin

  /** q14 — S2: the reference's ON CONFLICT upsert as distributed
    * latest-wins dedup — one row per user_id, newest event wins, with
    * a deterministic event_id tiebreak (reference
    * bronze/data_loader.py:602-679). Window + filter: at scale this is
    * one shuffle on the upsert key, no driver loop. */
  def latestWinsUpsert(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.t(s, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  private val latestWinsUpsertSql =
    """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---- q78: KMV distinct-count sketch -----------------------------

  /** Sketch size. 256 minima give ~1/sqrt(256-2) ≈ 6% expected
    * relative error — run configuration at scale. */
  private val KmvK = 256
  /** 16^15 = 2^60 — the denominator that maps a 15-hex-digit md5
    * prefix onto [0, 1). 15 digits (not 16) keeps the BIGINT positive
    * in both engines. */
  private val KmvDenom = 1.152921504606846976e18

  /** Shared by q78/q131 — the distinct md5 hash set of a column (the
    * value-set fingerprint every KMV computation starts from). */
  private def kmvHashSet(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNotNull)
      .select(md5(col(c).cast(StringType).cast(BinaryType)).as("h")).distinct()

  /** Shared estimator: exact below K, else (K−1)/u_K. Parity-critical
    * — q78 and q131 must never drift apart, so there is ONE copy. */
  private def kmvEst(hk: Column, kActual: Column): Column =
    when(kActual < KmvK, kActual.cast(DoubleType))
      .otherwise(lit((KmvK - 1).toDouble) /
        (conv(substring(hk, 1, 15), 16, 10).cast(DoubleType) / lit(KmvDenom)))

  /** The estimator's DuckDB twin (same single copy rule). */
  private def kmvEstSql(hk: String, kActual: String): String =
    s"""CASE WHEN $kActual < $KmvK THEN CAST($kActual AS DOUBLE)
       |     ELSE ${(KmvK - 1).toDouble} /
       |          (CAST(('0x' || substr($hk, 1, 15))::BIGINT AS DOUBLE) / $KmvDenom)
       |END""".stripMargin

  /** q78 — KMV (k-minimum-values) distinct-count sketch, the
    * mergeable cardinality estimator for corpus-scale profiling: keep
    * the K smallest md5 hashes of a column's value set; the K-th
    * minimum, read as a uniform [0,1) fraction, estimates the
    * cardinality as (K-1)/u_K. Unlike HyperLogLog (whose register
    * layout is engine-specific), md5 + lexicographic minima are
    * BIT-IDENTICAL across engines — so this sketch is oracle-
    * hash-verifiable AND its per-partition top-K merges associatively
    * (the production path: sketch per split, merge minima — no exact
    * distinct needed). Sets smaller than K report exactly (the
    * sketch holds every value). The exact count rides along here to
    * expose the realized relative error per column.
    * Scale: distinct-hash dedup is one shuffle; the K minima then
    * come from a TakeOrdered — O(K) per partition, K-row result. */
  def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.t(s, dir, "lineitem")
    val rows = Seq("l_orderkey", "l_partkey", "l_suppkey").map { c =>
      // eager localCheckpoint (the q131 rule): each column's distinct-
      // md5 set feeds BOTH the TakeOrdered minima and the exact count;
      // left lazy, the distinct shuffle recomputes per consumer
      val hs = kmvHashSet(l, c).localCheckpoint()
      val kth = hs.orderBy(col("h")).limit(KmvK)
        .agg(max(col("h")).as("hk"), count(lit(1)).as("k_actual"))
      val est = kmvEst(col("hk"), col("k_actual"))
      val exact = hs.agg(count(lit(1)).as("exact_distinct"))
      kth.crossJoin(exact).select(
        lit(c).as("column_name"),
        col("exact_distinct"),
        col("k_actual").cast(IntegerType).as("kmv_k"),
        snapRound(est, 4).as("kmv_estimate"))
    }
    rows.reduce(_ unionByName _)
      .withColumn("rel_error_pct",
        snapRound(abs(col("kmv_estimate") - col("exact_distinct").cast(DoubleType)) /
          col("exact_distinct").cast(DoubleType) * lit(100.0), 6))
      .orderBy(col("column_name"))
  }

  private val kmvDistinctSql = {
    def one(c: String) =
      s"""SELECT column_name, exact_distinct, kmv_k,
         |       ${snapRoundSql("est_raw", 4)} AS kmv_estimate
         |FROM (
         |  WITH hs AS (
         |    SELECT DISTINCT md5(CAST($c AS VARCHAR)) AS h
         |    FROM lineitem WHERE $c IS NOT NULL),
         |  kth AS (
         |    SELECT max(h) AS hk, count(1) AS k_actual
         |    FROM (SELECT h FROM hs ORDER BY h LIMIT $KmvK)),
         |  e AS (SELECT count(1) AS exact_distinct FROM hs)
         |  SELECT '$c' AS column_name, exact_distinct,
         |         CAST(k_actual AS INTEGER) AS kmv_k,
         |         ${kmvEstSql("hk", "k_actual")} AS est_raw
         |  FROM kth, e)""".stripMargin
    val unioned = Seq("l_orderkey", "l_partkey", "l_suppkey").map(one)
      .mkString("\nUNION ALL\n")
    s"""SELECT column_name, exact_distinct, kmv_k, kmv_estimate,
       |       ${snapRoundSql("abs(kmv_estimate - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE) * 100.0", 6)} AS rel_error_pct
       |FROM (
       |$unioned
       |)
       |ORDER BY column_name""".stripMargin
  }

  // ---- q88: bottom-k hash-sample quantile sketch ------------------

  /** Sample size: 1024 rows ≈ ±3% rank error at 95% (DKW bound). */
  private val HsK = 1024
  private val HsPs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  /** q88 — bottom-k hash-sample quantile sketch, the quantile member
    * of the deterministic sketch family (q78 KMV = distincts, q84 CMS
    * = frequencies): keep the K rows with the smallest md5(row key);
    * md5-uniformity makes them a uniform row sample, and nearest-rank
    * quantiles over the sample estimate the table's quantiles to
    * ~1/sqrt(K) in rank space. Unlike `approx_percentile` (whose
    * KLL-family sketch is engine-specific) the sample is a pure
    * function of the data — rerun-stable, partitioning-independent,
    * and bit-identical in any engine with md5, so the estimates are
    * oracle-hash-verifiable. Production API: functions.HashSample
    * (merge() folds per-split sketches associatively — the 100 TB
    * path never sorts or shuffles the table; the plan here is one
    * TakeOrdered with O(K) state per partition). The realized rank of
    * each estimate rides along (one conditional-aggregation pass
    * against the broadcast 10-row estimate frame) to expose the
    * actual rank error vs the DKW bound — measured, not claimed.
    * Exact-quantile twin at small scale: q12 (reference pd.quantile,
    * eda/supply_chain_eda.py:553-558); this is what replaces it when
    * the column no longer fits a sort. */
  def sampleQuantiles(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.t(s, dir, "lineitem")
    // one keyed projection shared by both columns: a uniform ROW
    // sample is simultaneously a uniform sample of every column
    val keyed = l.select(
      graft.functions.HashSample.hash(
        concat(col("l_orderkey").cast(StringType), lit("|"),
          col("l_linenumber").cast(StringType))).as("h"),
      col("l_extendedprice").as("ep"), col("l_quantity").as("qty"))
    val samp = keyed.orderBy(col("h")).limit(HsK)
      .agg(sort_array(collect_list(col("ep"))).as("sep"),
        sort_array(collect_list(col("qty"))).as("sqty"),
        count(lit(1)).as("sample_n"))
    // nearest-rank pick at ceil(p*n), 1-based — HashSample.quantile's
    // arithmetic, inlined over the two shared sorted-value arrays
    def pick(sv: Column) = element_at(sv,
      greatest(lit(1L), ceil(col("quantile_p") * col("sample_n"))).cast(IntegerType))
    val est = samp
      .select(explode(array(HsPs.map(lit): _*)).as("quantile_p"),
        col("sample_n"), col("sep"), col("sqty"))
      .select(col("quantile_p"), col("sample_n"), explode(array(
        struct(lit("l_extendedprice").as("column_name"), pick(col("sep")).as("estimate")),
        struct(lit("l_quantity").as("column_name"), pick(col("sqty")).as("estimate")))).as("e"))
      .select(col("e.column_name").as("column_name"), col("quantile_p"),
        col("sample_n"), col("e.estimate").as("estimate"))
    // realized rank of each estimate: integer hit-count over one scan
    // (exact in both engines — int sum then a single double division)
    keyed.crossJoin(broadcast(est))
      .groupBy(col("column_name"), col("quantile_p"), col("sample_n"), col("estimate"))
      .agg((sum(when(when(col("column_name") === "l_extendedprice", col("ep"))
        .otherwise(col("qty")) <= col("estimate"), 1L).otherwise(0L)).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("rr"))
      .select(col("column_name"), col("quantile_p"), col("sample_n"), col("estimate"),
        snapRound(col("rr"), 6).as("realized_rank"),
        snapRound(abs(col("rr") - col("quantile_p")), 6).as("rank_error"))
      .orderBy(col("column_name"), col("quantile_p"))
  }

  private val sampleQuantilesSql =
    s"""WITH keyed AS (
      |  SELECT md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)) AS h,
      |         l_extendedprice AS ep, l_quantity AS qty
      |  FROM lineitem),
      |samp AS (SELECT ep, qty FROM keyed ORDER BY h LIMIT $HsK),
      |agg AS (SELECT list_sort(list(ep)) AS sep, list_sort(list(qty)) AS sqty,
      |               count(*) AS sample_n FROM samp),
      |ps AS (SELECT unnest([${HsPs.mkString(", ")}]) AS quantile_p),
      |est AS (
      |  SELECT 'l_extendedprice' AS column_name, quantile_p, sample_n,
      |         sep[CAST(greatest(1, ceil(quantile_p * sample_n)) AS BIGINT)] AS estimate
      |  FROM ps, agg
      |  UNION ALL
      |  SELECT 'l_quantity', quantile_p, sample_n,
      |         sqty[CAST(greatest(1, ceil(quantile_p * sample_n)) AS BIGINT)]
      |  FROM ps, agg),
      |rk AS (
      |  SELECT e.column_name, e.quantile_p, e.sample_n, e.estimate,
      |         CAST(sum(CASE WHEN (CASE WHEN e.column_name = 'l_extendedprice'
      |                                  THEN k.ep ELSE k.qty END) <= e.estimate
      |                       THEN 1 ELSE 0 END) AS DOUBLE)
      |           / CAST(count(*) AS DOUBLE) AS rr
      |  FROM est e, keyed k
      |  GROUP BY 1, 2, 3, 4)
      |SELECT column_name, quantile_p, sample_n, estimate,
      |       ${snapRoundSql("rr", 6)} AS realized_rank,
      |       ${snapRoundSql("abs(rr - quantile_p)", 6)} AS rank_error
      |FROM rk ORDER BY column_name, quantile_p""".stripMargin

  // ---- q95: RFM customer segmentation ------------------------------

  /** The per-customer R/F/M frame q95 ranks and q159 buckets: recency
    * (days since last order vs the corpus max date), frequency (order
    * count), monetary (exact money sum). */
  private def rfmPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.t(s, dir, "orders")
    val ref = o.agg(max(col("o_orderdate").cast(DateType)).as("ref_date"))
    o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate").cast(DateType)).as("last_order"),
        count(lit(1)).as("frequency"),
        moneySum(col("o_totalprice")).as("monetary"))
      .crossJoin(broadcast(ref)) // 1-row scalar — the allow-listed shape
      .select(col("o_custkey").as("custkey"),
        datediff(col("ref_date"), col("last_order")).cast(LongType).as("recency_days"),
        col("frequency"), col("monetary"))
  }

  /** Shared per-customer CTEs of the q95/q159 oracle SQL. */
  private val rfmPerSql =
    """ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_date FROM orders),
      |per AS (
      |  SELECT o_custkey AS custkey,
      |         CAST(datediff('day', max(CAST(o_orderdate AS DATE)), (SELECT ref_date FROM ref)) AS BIGINT) AS recency_days,
      |         count(1) AS frequency,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS monetary
      |  FROM orders GROUP BY 1)""".stripMargin

  /** q95 — RFM segmentation over the order history: per customer,
    * recency (days since last order, against the corpus max date),
    * frequency (order count), monetary (exact money sum), each cut
    * into quartiles (rank-based ntile with a custkey tiebreak — the
    * q77 portability rule: interpolated percentiles differ in the
    * last ulp across engines, ranks never do) and concatenated into
    * the classic R-F-M segment label. Scale: the per-customer frame
    * is a derived aggregate ≪ the fact; the three global ntile
    * windows sort that frame once each — at extreme customer
    * cardinality the dial is q159 (rfmSketchSegments): sample-based
    * cutpoint thresholds in place of the global rank, built and
    * disagreement-bounded by RfmSketchSpec. */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val per = rfmPerCustomer(s, dir)
    import org.apache.spark.sql.expressions.Window
    val rQ = ntile(4).over(Window.orderBy(col("recency_days"), col("custkey")))
    val fQ = ntile(4).over(Window.orderBy(col("frequency").desc, col("custkey")))
    val mQ = ntile(4).over(Window.orderBy(col("monetary").desc, col("custkey")))
    per.withColumn("r_quartile", rQ)
      .withColumn("f_quartile", fQ)
      .withColumn("m_quartile", mQ)
      .withColumn("segment", concat_ws("-",
        col("r_quartile"), col("f_quartile"), col("m_quartile")))
      .orderBy(col("custkey"))
  }

  private val rfmSegmentsSql =
    s"""WITH $rfmPerSql,
      |q AS (
      |  SELECT *,
      |         ntile(4) OVER (ORDER BY recency_days, custkey) AS r_quartile,
      |         ntile(4) OVER (ORDER BY frequency DESC, custkey) AS f_quartile,
      |         ntile(4) OVER (ORDER BY monetary DESC, custkey) AS m_quartile
      |  FROM per)
      |SELECT custkey, recency_days, frequency, monetary,
      |       CAST(r_quartile AS INTEGER) AS r_quartile,
      |       CAST(f_quartile AS INTEGER) AS f_quartile,
      |       CAST(m_quartile AS INTEGER) AS m_quartile,
      |       CAST(r_quartile AS VARCHAR) || '-' || CAST(f_quartile AS VARCHAR) || '-' || CAST(m_quartile AS VARCHAR) AS segment
      |FROM q ORDER BY custkey""".stripMargin

  // ---- q159: RFM segmentation via sketch cutpoints -------------------

  /** Sample size of the q159 cutpoint sketch (the q88 K). */
  private val RfmSketchK = 1024

  /** q159 — the 100-TB-scale path for q95 (round-12 ask #5): the three
    * exact global ntile windows funnel every customer through ONE task
    * — correct, but a single-task sort at extreme customer cardinality.
    * This variant ranks against QUARTILE CUTPOINTS taken from a
    * K=1024 deterministic hash sample (md5-keyed, the q59/q88 coin):
    * per metric, the sample's exact nearest-rank quantiles at
    * .25/.50/.75 (the q127 rule — an ORDER STATISTIC of the sample,
    * never an interpolated float) become broadcast bounds, and each
    * customer's quartile is 1 + (#cutpoints passed) — a narrow map, no
    * global window anywhere, so the plan scales to any cardinality.
    * By the DKW inequality the sample rank error is ≤ ~sqrt(ln(2/δ)/2K)
    * ≈ 4% at K=1024 with 95% confidence — RfmSketchSpec measures the
    * realized quartile agreement against q95's exact ntile. Parity:
    * cutpoints are exact sampled VALUES; every comparison is exact;
    * the md5 sample order is engine-identical. Scale: one derived
    * aggregate (as q95), one K-row TakeOrdered, one broadcast — the
    * documented dial (`Eda.scala` q95 scaladoc) actually built. */
  def rfmSketchSegments(s: SparkSession, dir: String): DataFrame = {
    val per = rfmPerCustomer(s, dir)
    val sample = per
      .withColumn("h", md5(col("custkey").cast(StringType).cast(BinaryType)))
      .orderBy(col("h"), col("custkey")).limit(RfmSketchK)
    val agg = sample.agg(
      sort_array(collect_list(col("recency_days"))).as("sr"),
      sort_array(collect_list(col("frequency"))).as("sf"),
      sort_array(collect_list(col("monetary"))).as("sm"),
      count(lit(1)).as("n"))
    def cut(arr: String, q: Double): Column = element_at(col(arr),
      greatest(lit(1L), ceil(lit(q) * col("n")).cast(LongType)).cast(IntegerType))
    val bounds = agg.select(col("n").as("sample_n"),
      cut("sr", 0.25).as("r25"), cut("sr", 0.50).as("r50"), cut("sr", 0.75).as("r75"),
      cut("sf", 0.25).as("f25"), cut("sf", 0.50).as("f50"), cut("sf", 0.75).as("f75"),
      cut("sm", 0.25).as("m25"), cut("sm", 0.50).as("m50"), cut("sm", 0.75).as("m75"))
    def asc(v: Column, c25: Column, c50: Column, c75: Column): Column =
      (lit(1) + (v > c25).cast(IntegerType) + (v > c50).cast(IntegerType) +
        (v > c75).cast(IntegerType))
    // descending metrics (q95 ranks frequency/monetary DESC: top 25% →
    // quartile 1): count the cutpoints the value does NOT exceed
    def desc(v: Column, c25: Column, c50: Column, c75: Column): Column =
      (lit(1) + (v <= c75).cast(IntegerType) + (v <= c50).cast(IntegerType) +
        (v <= c25).cast(IntegerType))
    per.crossJoin(broadcast(bounds))
      .select(col("custkey"), col("recency_days"), col("frequency"), col("monetary"),
        col("sample_n"),
        asc(col("recency_days"), col("r25"), col("r50"), col("r75")).as("r_quartile"),
        desc(col("frequency"), col("f25"), col("f50"), col("f75")).as("f_quartile"),
        desc(col("monetary"), col("m25"), col("m50"), col("m75")).as("m_quartile"))
      .withColumn("segment", concat_ws("-",
        col("r_quartile"), col("f_quartile"), col("m_quartile")))
      .orderBy(col("custkey"))
  }

  private val rfmSketchSegmentsSql = {
    def cutSql(arr: String, q: String) =
      s"$arr[CAST(greatest(1, ceil($q * n)) AS BIGINT)]"
    def ascSql(v: String, p: String) =
      s"CAST(1 + (CASE WHEN $v > b.${p}25 THEN 1 ELSE 0 END) + (CASE WHEN $v > b.${p}50 THEN 1 ELSE 0 END) + (CASE WHEN $v > b.${p}75 THEN 1 ELSE 0 END) AS INTEGER)"
    def descSql(v: String, p: String) =
      s"CAST(1 + (CASE WHEN $v <= b.${p}75 THEN 1 ELSE 0 END) + (CASE WHEN $v <= b.${p}50 THEN 1 ELSE 0 END) + (CASE WHEN $v <= b.${p}25 THEN 1 ELSE 0 END) AS INTEGER)"
    s"""WITH $rfmPerSql,
      |sk AS (SELECT * FROM per ORDER BY md5(CAST(custkey AS VARCHAR)), custkey LIMIT $RfmSketchK),
      |ag AS (SELECT list_sort(list(recency_days)) AS sr, list_sort(list(frequency)) AS sf,
      |              list_sort(list(monetary)) AS sm, count(*) AS n FROM sk),
      |b AS (SELECT CAST(n AS BIGINT) AS sample_n,
      |        ${cutSql("sr", "0.25")} AS r25, ${cutSql("sr", "0.50")} AS r50, ${cutSql("sr", "0.75")} AS r75,
      |        ${cutSql("sf", "0.25")} AS f25, ${cutSql("sf", "0.50")} AS f50, ${cutSql("sf", "0.75")} AS f75,
      |        ${cutSql("sm", "0.25")} AS m25, ${cutSql("sm", "0.50")} AS m50, ${cutSql("sm", "0.75")} AS m75
      |      FROM ag),
      |qq AS (
      |  SELECT p.custkey, p.recency_days, p.frequency, p.monetary, b.sample_n,
      |         ${ascSql("p.recency_days", "r")} AS r_quartile,
      |         ${descSql("p.frequency", "f")} AS f_quartile,
      |         ${descSql("p.monetary", "m")} AS m_quartile
      |  FROM per p, b)
      |SELECT custkey, recency_days, frequency, monetary, sample_n,
      |       r_quartile, f_quartile, m_quartile,
      |       CAST(r_quartile AS VARCHAR) || '-' || CAST(f_quartile AS VARCHAR) || '-' || CAST(m_quartile AS VARCHAR) AS segment
      |FROM qq ORDER BY custkey""".stripMargin
  }

  // ---- q121: k-anonymity suppression --------------------------------

  /** Minimum quasi-identifier group size that may be released. */
  private val KAnonK = 10

  /** q121 — k-anonymity suppression (Sweeney 2002), the privacy gate
    * before user-derived records enter a shared corpus or report:
    * quasi-identifier groups (nation × market segment) with fewer than
    * KAnonK members are SUPPRESSED — generalized into one NULL-keyed
    * residual bucket (group count + member mass preserved, identities
    * not) — because a small group re-identifies its members by
    * intersection. Kept rows release their exact counts. One pass:
    * the group frame maps each group to its released or NULLed keys
    * and a second tiny aggregation folds the residual — the user
    * table aggregates ONCE (two filtered branches would scan it
    * twice). Scale: both aggregations are hash aggs; the second runs
    * on group-space rows. */
  def kAnonymity(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.t(s, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_users"))
    val keep = col("n_users") >= KAnonK
    g.select(
      when(keep, col("c_nationkey")).otherwise(lit(null)).cast(IntegerType).as("nation_key"),
      when(keep, col("c_mktsegment")).otherwise(lit(null)).cast(StringType).as("segment"),
      (!keep).as("is_suppressed"), col("n_users"))
      .groupBy(col("nation_key"), col("segment"), col("is_suppressed"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n_users")).as("n_users"))
      .select(col("nation_key"), col("segment"), col("n_groups"),
        col("n_users"), col("is_suppressed"))
      .orderBy(col("is_suppressed"), col("nation_key"), col("segment"))
  }

  private val kAnonymitySql =
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment, count(1) AS n_users
       |  FROM customer GROUP BY 1, 2),
       |t AS (
       |  SELECT CASE WHEN n_users >= $KAnonK THEN c_nationkey END AS nation_key,
       |         CASE WHEN n_users >= $KAnonK THEN c_mktsegment END AS segment,
       |         n_users < $KAnonK AS is_suppressed, n_users
       |  FROM g)
       |SELECT nation_key, segment, count(1) AS n_groups,
       |       CAST(sum(n_users) AS BIGINT) AS n_users, is_suppressed
       |FROM t GROUP BY nation_key, segment, is_suppressed
       |ORDER BY is_suppressed, nation_key, segment""".stripMargin

  // ---- q149: l-diversity audit ---------------------------------------

  /** Minimum count of distinct sensitive values a released group needs. */
  private val LDiversityL = 3

  /** q149 — l-diversity audit (Machanavajjhala et al. 2007), the gap
    * k-anonymity leaves open: a quasi-identifier group can satisfy
    * k ≥ KAnonK yet be HOMOGENEOUS in the sensitive attribute, so
    * membership alone discloses it. Over the q121 QI groups
    * (nation × market segment) with account-balance BAND as the
    * sensitive attribute (fixed exact-decimal thresholds — no
    * data-dependent quantiles, so band edges are engine-identical),
    * report each group's size, distinct sensitive values, and the
    * dominant band's share; `at_risk` marks the dangerous quadrant —
    * groups that PASS k-anonymity but fail l-diversity (l <
    * LDiversityL), exactly the rows a k-only gate would release.
    * Scale: two stacked hash aggregations ((QI, band) then QI) — the
    * user table aggregates once, everything downstream is group-space.
    * The dominant share is one IEEE division of exact counts. */
  def lDiversity(s: SparkSession, dir: String): DataFrame = {
    val band = when(col("c_acctbal") < 0, lit("neg"))
      .when(col("c_acctbal") < 3000.0, lit("low"))
      .when(col("c_acctbal") < 7000.0, lit("mid"))
      .otherwise(lit("high"))
    Tables.t(s, dir, "customer")
      .select(col("c_nationkey").as("nation_key"),
        col("c_mktsegment").as("segment"), band.as("bal_band"))
      .groupBy(col("nation_key"), col("segment"), col("bal_band"))
      .agg(count(lit(1)).as("band_n"))
      .groupBy(col("nation_key"), col("segment"))
      .agg(sum(col("band_n")).as("n_users"),
        count(lit(1)).as("n_sensitive_values"),
        max(col("band_n")).as("top_band_n"))
      .select(col("nation_key"), col("segment"), col("n_users"),
        col("n_sensitive_values"),
        (col("top_band_n").cast(DoubleType) / col("n_users").cast(DoubleType))
          .as("dominant_share"),
        (col("n_sensitive_values") >= LDiversityL).as("is_l_diverse"),
        (col("n_users") >= KAnonK && col("n_sensitive_values") < LDiversityL)
          .as("at_risk"))
      .orderBy(col("nation_key"), col("segment"))
  }

  private val lDiversitySql =
    s"""WITH ldb AS (
       |  SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
       |         CASE WHEN c_acctbal < 0 THEN 'neg'
       |              WHEN c_acctbal < 3000.0 THEN 'low'
       |              WHEN c_acctbal < 7000.0 THEN 'mid'
       |              ELSE 'high' END AS bal_band
       |  FROM customer),
       |ldg AS (
       |  SELECT nation_key, segment, bal_band, count(1) AS band_n
       |  FROM ldb GROUP BY 1, 2, 3),
       |lda AS (
       |  SELECT nation_key, segment,
       |         CAST(sum(band_n) AS BIGINT) AS n_users,
       |         count(1) AS n_sensitive_values,
       |         CAST(max(band_n) AS BIGINT) AS top_band_n
       |  FROM ldg GROUP BY 1, 2)
       |SELECT nation_key, segment, n_users, n_sensitive_values,
       |       CAST(top_band_n AS DOUBLE) / CAST(n_users AS DOUBLE) AS dominant_share,
       |       n_sensitive_values >= $LDiversityL AS is_l_diverse,
       |       n_users >= $KAnonK AND n_sensitive_values < $LDiversityL AS at_risk
       |FROM lda ORDER BY nation_key, segment""".stripMargin

  // ---- q164: t-closeness audit ---------------------------------------

  /** Maximum Earth-Mover's Distance a released group's sensitive
    * distribution may sit from the corpus distribution (Li et al.'s
    * canonical example threshold). */
  private val TCloseT = 0.2

  /** q164 — t-closeness audit (Li, Li & Venkatasubramanian 2007), the
    * gap l-diversity leaves open: a group can carry ≥ l distinct
    * sensitive values yet be heavily SKEWED toward one of them, and
    * skew relative to the corpus is itself a disclosure. Over the
    * q121 QI groups with q149's ordered balance-band ladder (neg <
    * low < mid < high) as the sensitive attribute, each group's EMD
    * from the corpus distribution uses the ordered-attribute formula
    * EMD = Σᵢ |Pᵢ − Qᵢ| / (m−1) over cumulative shares. Exactness on
    * the band lattice (the q162 histogram argument): Pᵢ − Qᵢ =
    * (cumᵢ·N − Cᵢ·n) / (n·N) has an INTEGER numerator, so the sum
    * folds exact longs and pays ONE IEEE division, snapped 6dp —
    * bit-identical cross-engine. `at_risk` marks groups k-anonymity
    * would release (n ≥ KAnonK) whose EMD exceeds TCloseT — with
    * q121 + q149 this completes the standard release-gate triad.
    * Scale: one hash aggregation to group space (the four cumulative
    * counts fold map-side), a 1-row corpus total broadcast — nothing
    * downstream touches user rows. */
  def tCloseness(s: SparkSession, dir: String): DataFrame = {
    val ord = when(col("c_acctbal") < 0, lit(1))
      .when(col("c_acctbal") < 3000.0, lit(2))
      .when(col("c_acctbal") < 7000.0, lit(3))
      .otherwise(lit(4))
    val rows = Tables.t(s, dir, "customer")
      .select(col("c_nationkey").as("nation_key"),
        col("c_mktsegment").as("segment"), ord.as("ord"))
    def cums(prefix: String) = (1 to 3).map(i =>
      sum(when(col("ord") <= i, 1L).otherwise(0L)).as(s"$prefix$i"))
    val g = rows.groupBy(col("nation_key"), col("segment"))
      .agg(count(lit(1)).as("n_users"), cums("cum1to"): _*)
    val tot = rows.agg(count(lit(1)).as("n_total"), cums("tot1to"): _*)
    val num = (1 to 3).map(i =>
      abs(col(s"cum1to$i") * col("n_total") - col(s"tot1to$i") * col("n_users")))
      .reduce(_ + _)
    g.crossJoin(broadcast(tot))
      .select(col("nation_key"), col("segment"), col("n_users"),
        snapRound(num.cast(DoubleType) /
          (col("n_users") * col("n_total") * lit(3)).cast(DoubleType), 6).as("emd"))
      .select(col("nation_key"), col("segment"), col("n_users"), col("emd"),
        (col("emd") <= TCloseT).as("is_t_close"),
        (col("n_users") >= KAnonK && col("emd") > TCloseT).as("at_risk"))
      .orderBy(col("nation_key"), col("segment"))
  }

  private val tClosenessSql = {
    val cumsG = (1 to 3).map(i =>
      s"CAST(sum(CASE WHEN ord <= $i THEN 1 ELSE 0 END) AS BIGINT) AS cum1to$i").mkString(", ")
    val cumsT = (1 to 3).map(i =>
      s"CAST(sum(CASE WHEN ord <= $i THEN 1 ELSE 0 END) AS BIGINT) AS tot1to$i").mkString(", ")
    val num = (1 to 3).map(i => s"abs(cum1to$i * n_total - tot1to$i * n_users)")
      .mkString(" + ")
    s"""WITH tcb AS (
       |  SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
       |         CASE WHEN c_acctbal < 0 THEN 1
       |              WHEN c_acctbal < 3000.0 THEN 2
       |              WHEN c_acctbal < 7000.0 THEN 3
       |              ELSE 4 END AS ord
       |  FROM customer),
       |tcg AS (
       |  SELECT nation_key, segment, CAST(count(1) AS BIGINT) AS n_users, $cumsG
       |  FROM tcb GROUP BY 1, 2),
       |tct AS (
       |  SELECT CAST(count(1) AS BIGINT) AS n_total, $cumsT FROM tcb),
       |tce AS (
       |  SELECT nation_key, segment, n_users,
       |         ${snapRoundSql(s"CAST($num AS DOUBLE) / CAST(n_users * n_total * 3 AS DOUBLE)", 6)} AS emd
       |  FROM tcg CROSS JOIN tct)
       |SELECT nation_key, segment, n_users, emd,
       |       emd <= $TCloseT AS is_t_close,
       |       n_users >= $KAnonK AND emd > $TCloseT AS at_risk
       |FROM tce ORDER BY nation_key, segment""".stripMargin
  }

  // ---- q153: Mann–Kendall trend test ---------------------------------

  /** Two-sided 5% normal critical value for the trend call. */
  private val MkZCrit = 1.96

  /** q153 — Mann–Kendall monotone-trend test (Mann 1945, Kendall 1975)
    * per order priority over the daily order-count series: the
    * nonparametric partner of q128's OLS trend — rank-based, so one
    * spike can't fake a slope. S = Σ_{i<j} sign(x_j − x_i) and the tie
    * correction Σ t(t−1)(2t+5) are EXACT integers (bit-identical
    * cross-engine, no snap anywhere until z); Var(S) divides the exact
    * numerator by 18.0 once, z applies the ±1 continuity correction
    * over a correctly-rounded sqrt — both IEEE steps on identical
    * inputs. Scale: the pair join is per-priority on the DAILY
    * AGGREGATE (calendar-bounded — days², not orders², and the fact
    * collapses to days × priorities first); the tie table is
    * value-group-sized. */
  def mannKendall(s: SparkSession, dir: String): DataFrame = {
    import graft.util.Parity.snapRound
    val daily = Tables.t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderdate").cast(DateType).as("d"))
      .agg(count(lit(1)).as("x"))
    val a = daily.select(col("priority"), col("d").as("d1"), col("x").as("x1"))
    val b = daily.select(col("priority"), col("d").as("d2"), col("x").as("x2"))
    val sStat = a.join(b, Seq("priority")).filter(col("d1") < col("d2"))
      .groupBy(col("priority"))
      .agg(sum(signum(col("x2") - col("x1")).cast(LongType)).as("s_stat"))
    val nDays = daily.groupBy(col("priority")).agg(count(lit(1)).as("n"))
    val ties = daily.groupBy(col("priority"), col("x"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("priority"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tie_term"))
    // LEFT join + coalesce (r11 advice): a priority observed on only
    // one day has no (d1 < d2) pair, so an inner join would silently
    // drop it; report it as n_days=1, S=0, no_trend instead (var_s=0
    // and the z branch for S=0 is the constant 0.0 — no division)
    nDays.join(broadcast(sStat), Seq("priority"), "left") // priority-cardinality side
      .na.fill(0L, Seq("s_stat"))
      .join(ties, "priority")
      .withColumn("var_s",
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tie_term"))
          .cast(DoubleType) / lit(18.0))
      .withColumn("z_stat", snapRound(
        when(col("s_stat") > 0, (col("s_stat") - lit(1)).cast(DoubleType) / sqrt(col("var_s")))
          .when(col("s_stat") < 0, (col("s_stat") + lit(1)).cast(DoubleType) / sqrt(col("var_s")))
          .otherwise(lit(0.0)), 6))
      .select(col("priority"), col("n").as("n_days"), col("s_stat"),
        col("tie_term"), snapRound(col("var_s"), 4).as("var_s"), col("z_stat"),
        when(col("z_stat") > MkZCrit, lit("increasing"))
          .when(col("z_stat") < -MkZCrit, lit("decreasing"))
          .otherwise(lit("no_trend")).as("trend"))
      .orderBy(col("priority"))
  }

  private val mannKendallSql = {
    import graft.util.Parity.snapRoundSql
    val zRaw = "CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s) " +
      "WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s) ELSE 0.0 END"
    s"""WITH mkd AS (
       |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
       |         count(1) AS x
       |  FROM orders GROUP BY 1, 2),
       |mks AS (
       |  SELECT a.priority,
       |         CAST(sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
       |  FROM mkd a JOIN mkd b ON a.priority = b.priority AND a.d < b.d
       |  GROUP BY 1),
       |mkn AS (SELECT priority, count(1) AS n FROM mkd GROUP BY 1),
       |mkt AS (
       |  SELECT priority, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
       |  FROM (SELECT priority, x, count(1) AS t FROM mkd GROUP BY 1, 2) GROUP BY 1),
       |mkv AS (
       |  SELECT n.priority, n.n, CAST(coalesce(s.s_stat, 0) AS BIGINT) AS s_stat, t.tie_term,
       |         CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term AS DOUBLE) / 18.0 AS var_s
       |  FROM mkn n LEFT JOIN mks s ON n.priority = s.priority
       |  JOIN mkt t ON n.priority = t.priority),
       |mkz AS (SELECT *, ${snapRoundSql(zRaw, 6)} AS z_stat FROM mkv)
       |SELECT priority, n AS n_days, s_stat, tie_term,
       |       ${snapRoundSql("var_s", 4)} AS var_s, z_stat,
       |       CASE WHEN z_stat > $MkZCrit THEN 'increasing'
       |            WHEN z_stat < -$MkZCrit THEN 'decreasing'
       |            ELSE 'no_trend' END AS trend
       |FROM mkz ORDER BY priority""".stripMargin
  }

  // ---- q154: CUSUM changepoint ---------------------------------------

  /** q154 — CUSUM changepoint per order priority over the daily
    * revenue series (Page 1954; the retrospective max-|CUSUM| form):
    * the day i maximizing |n·P_i − i·T| (P = prefix sum, T = total) —
    * algebraically n·|Σ_{k≤i}(y_k − ȳ)|, but with the mean CLEARED so
    * the argmax compares EXACT integers (cents), never accumulated
    * doubles: cross-engine identical by construction, ties broken by
    * earliest day. The deviation routes through DECIMAL(38,0)/HUGEINT
    * (n·P overflows 64-bit at planetary revenue; the q138 combine
    * rule). Reported: the changepoint day, the normalized CUSUM stat
    * (one exact-integer division), and the exact segment means before/
    * after (money avgs of cents). The stat's decimal→double edge obeys
    * Parity rule 5: |n·P| here is ≤ ~5e15 < 2^53 at sf0.1 (exact in
    * both engines); a deployment at planetary revenue keeps the
    * division in decimal. Scale: one (priority, day) aggregation,
    * per-priority calendar-bounded prefix windows, a 1-per-priority
    * argmax — the fact collapses first, like q153. */
  def cusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    import graft.util.Parity.snapRound
    import org.apache.spark.sql.expressions.Window
    val cents = round(col("o_totalprice") * 100).cast(LongType)
    val daily = Tables.t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderdate").cast(DateType).as("d"))
      .agg(sum(cents).as("c"))
    val w = Window.partitionBy(col("priority")).orderBy(col("d"))
    val pre = daily
      .withColumn("i", row_number().over(w).cast(LongType))
      .withColumn("p", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val tot = daily.groupBy(col("priority"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("t"))
    def d128(c: Column) = c.cast(DecimalType(19, 0))
    val dev = pre.join(broadcast(tot), "priority")
      .withColumn("dev", abs(d128(col("n")) * d128(col("p")) -
        d128(col("i")) * d128(col("t"))))
    val wPick = Window.partitionBy(col("priority"))
      .orderBy(col("dev").desc, col("d"))
    dev.withColumn("rk", row_number().over(wPick)).filter(col("rk") === 1)
      .select(col("priority"), col("n").as("n_days"), col("d").as("cp_date"),
        col("i").as("cp_index"),
        // dev / (n·100): the max |Σ(y−ȳ)| in money units
        snapRound(col("dev").cast(DoubleType) /
          (col("n").cast(DoubleType) * lit(100.0)), 4).as("cusum_stat"),
        snapRound(col("p").cast(DoubleType) /
          (col("i").cast(DoubleType) * lit(100.0)), 4).as("mean_before"),
        when(col("n") > col("i"), snapRound(
          (col("t") - col("p")).cast(DoubleType) /
            ((col("n") - col("i")).cast(DoubleType) * lit(100.0)), 4))
          .as("mean_after"))
      .withColumn("shift",
        when(col("mean_after").isNotNull,
          snapRound(col("mean_after") - col("mean_before"), 4)))
      .orderBy(col("priority"))
  }

  private val cusumChangepointSql = {
    import graft.util.Parity.snapRoundSql
    s"""WITH cud AS (
       |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
       |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
       |  FROM orders GROUP BY 1, 2),
       |cup AS (
       |  SELECT priority, d,
       |         CAST(row_number() OVER (PARTITION BY priority ORDER BY d) AS BIGINT) AS i,
       |         CAST(sum(c) OVER (PARTITION BY priority ORDER BY d
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
       |  FROM cud),
       |cut AS (SELECT priority, count(1) AS n, CAST(sum(c) AS BIGINT) AS t FROM cud GROUP BY 1),
       |cuv AS (
       |  SELECT cup.priority, cup.d, cup.i, cup.p, cut.n, cut.t,
       |         abs(CAST(cut.n AS HUGEINT) * cup.p - CAST(cup.i AS HUGEINT) * cut.t) AS dev
       |  FROM cup JOIN cut ON cup.priority = cut.priority),
       |cur AS (
       |  SELECT *, row_number() OVER (PARTITION BY priority ORDER BY dev DESC, d) AS rk
       |  FROM cuv)
       |SELECT priority, n AS n_days, d AS cp_date, i AS cp_index,
       |       ${snapRoundSql("CAST(dev AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)", 4)} AS cusum_stat,
       |       ${snapRoundSql("CAST(p AS DOUBLE) / (CAST(i AS DOUBLE) * 100.0)", 4)} AS mean_before,
       |       CASE WHEN n > i THEN ${snapRoundSql(
      "CAST(t - p AS DOUBLE) / (CAST(n - i AS DOUBLE) * 100.0)", 4)} END AS mean_after,
       |       CASE WHEN n > i THEN ${snapRoundSql(
      s"(${snapRoundSql("CAST(t - p AS DOUBLE) / (CAST(n - i AS DOUBLE) * 100.0)", 4)}) - " +
        s"(${snapRoundSql("CAST(p AS DOUBLE) / (CAST(i AS DOUBLE) * 100.0)", 4)})", 4)} END AS shift
       |FROM cur WHERE rk = 1 ORDER BY priority""".stripMargin
  }

  // ---- q131: KMV set algebra (join-size estimation) -----------------

  /** q131 — KMV sketch SET OPERATIONS (Beyer et al. 2007), the
    * join-size estimator a CBO runs before committing to a plan: from
    * two K-minima sketches, the K smallest of their union estimate
    * |A∪B|, and the fraction ρ of those union minima present in BOTH
    * input sketches estimates Jaccard — so |A∩B| ≈ ρ·|A∪B|, without
    * ever joining the full sets. Everything is md5 minima (the q78
    * rule: bit-identical cross-engine, unlike HLL registers), and
    * sets smaller than K report exactly. Exact counts ride along to
    * expose realized error. Scale: each sketch is one distinct-hash
    * shuffle + TakeOrdered; the algebra then runs on K-row frames —
    * estimating a fact-fact join size costs two column scans, not the
    * join. NOTE: that claim describes the production API
    * (functions.Kmv / util.JoinAdvisor, which never join the full
    * sets); THIS query deliberately also runs the exact fact-fact
    * hash-set joins (`exact_*` below) so the oracle can verify the
    * realized estimation error — most of the query's measured cost is
    * that exact side, not the estimator being benchmarked. */
  def kmvSetOps(s: SparkSession, dir: String): DataFrame = {
    def pair(label: String, dfA: DataFrame, cA: String,
        dfB: DataFrame, cB: String): DataFrame = {
      // eager localCheckpoint (round-13 ask #3): each hash set feeds
      // THREE consumers below (its TakeOrdered minima, the exact
      // count, the exact intersection) — left lazy, the distinct-md5
      // shuffle recomputes per consumer and this is the slowest query
      // on the board; checkpointed, each side's set materializes once
      // per call (the q90 lineage-truncation rule — a plain persist
      // would still re-pay Catalyst analysis per run)
      val hsA = kmvHashSet(dfA, cA).localCheckpoint()
      val hsB = kmvHashSet(dfB, cB).localCheckpoint()
      val aMin = hsA.orderBy(col("h")).limit(KmvK)
      val bMin = hsB.orderBy(col("h")).limit(KmvK)
      val merged = aMin.unionByName(bMin).distinct().orderBy(col("h")).limit(KmvK)
      val kth = merged.agg(max(col("h")).as("hk"), count(lit(1)).as("k_actual"))
      val kInter = merged.join(aMin, "h").join(bMin, "h")
        .agg(count(lit(1)).as("k_inter"))
      // broadcast the DIMENSION side's set in the exact-verify join:
      // both callers pass a key-of-the-dimension as B (customer, part),
      // so hsB is dimension-cardinality while hsA is fact-sized — the
      // SMJ sorted both checkpointed sets when a map-side hash probe of
      // the small one does (guide §3.1)
      val exacts = hsA.agg(count(lit(1)).as("exact_a"))
        .crossJoin(hsB.agg(count(lit(1)).as("exact_b")))
        .crossJoin(hsA.join(broadcast(hsB), "h").agg(count(lit(1)).as("exact_inter")))
      val unionEst = kmvEst(col("hk"), col("k_actual"))
      kth.crossJoin(kInter).crossJoin(exacts).select(
        lit(label).as("pair"),
        col("exact_a"), col("exact_b"), col("exact_inter"),
        (col("exact_a") + col("exact_b") - col("exact_inter")).as("exact_union"),
        snapRound(unionEst, 4).as("kmv_union_est"),
        snapRound(unionEst * col("k_inter").cast(DoubleType) /
          col("k_actual").cast(DoubleType), 4).as("kmv_inter_est"))
    }
    pair("orders_custkey x customer_custkey",
        Tables.t(s, dir, "orders"), "o_custkey",
        Tables.t(s, dir, "customer"), "c_custkey")
      .unionByName(pair("lineitem_partkey x part_partkey",
        Tables.t(s, dir, "lineitem"), "l_partkey",
        Tables.t(s, dir, "part"), "p_partkey"))
      .orderBy(col("pair"))
  }

  private val kmvSetOpsSql = {
    def one(label: String, tblA: String, cA: String, tblB: String, cB: String) =
      s"""SELECT '$label' AS pair, exact_a, exact_b, exact_inter,
         |       exact_a + exact_b - exact_inter AS exact_union,
         |       ${snapRoundSql("union_est", 4)} AS kmv_union_est,
         |       ${snapRoundSql("union_est * CAST(k_inter AS DOUBLE) / CAST(k_actual AS DOUBLE)", 4)} AS kmv_inter_est
         |FROM (
         |  WITH hsa AS (SELECT DISTINCT md5(CAST($cA AS VARCHAR)) AS h
         |               FROM $tblA WHERE $cA IS NOT NULL),
         |  hsb AS (SELECT DISTINCT md5(CAST($cB AS VARCHAR)) AS h
         |          FROM $tblB WHERE $cB IS NOT NULL),
         |  amin AS (SELECT h FROM hsa ORDER BY h LIMIT $KmvK),
         |  bmin AS (SELECT h FROM hsb ORDER BY h LIMIT $KmvK),
         |  merged AS (SELECT h FROM (SELECT h FROM amin UNION SELECT h FROM bmin)
         |             ORDER BY h LIMIT $KmvK),
         |  kth AS (SELECT max(h) AS hk, count(1) AS k_actual FROM merged),
         |  ki AS (SELECT count(1) AS k_inter FROM merged
         |         JOIN amin USING (h) JOIN bmin USING (h)),
         |  ex AS (SELECT (SELECT count(1) FROM hsa) AS exact_a,
         |                (SELECT count(1) FROM hsb) AS exact_b,
         |                (SELECT count(1) FROM hsa JOIN hsb USING (h)) AS exact_inter)
         |  SELECT exact_a, exact_b, exact_inter, k_inter, k_actual,
         |         ${kmvEstSql("hk", "k_actual")} AS union_est
         |  FROM kth, ki, ex)""".stripMargin
    s"""${one("orders_custkey x customer_custkey", "orders", "o_custkey", "customer", "c_custkey")}
       |UNION ALL
       |${one("lineitem_partkey x part_partkey", "lineitem", "l_partkey", "part", "p_partkey")}
       |ORDER BY pair""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q131_kmv_set_ops" -> kmvSetOps,
    "q121_k_anonymity" -> kAnonymity,
    "q149_l_diversity" -> lDiversity,
    "q164_t_closeness" -> tCloseness,
    "q153_mann_kendall" -> mannKendall,
    "q154_cusum_changepoint" -> cusumChangepoint,
    "q95_rfm_segments" -> rfmSegments,
    "q159_rfm_sketch" -> rfmSketchSegments,
    "q05_topk_customers" -> topkCustomers,
    "q06_pagination" -> pagination,
    "q07_distinct_entities" -> distinctEntities,
    "q08_value_counts" -> valueCounts,
    "q09_null_profile" -> nullProfile,
    "q10_stats_profile" -> statsProfile,
    "q11_corr_matrix" -> corrMatrix,
    "q12_quantile_buckets" -> quantileBuckets,
    "q13_reconciliation" -> reconciliation,
    "q14_latest_wins_upsert" -> latestWinsUpsert,
    "q19_cast_join" -> castJoin,
    "q42_categorical_mode" -> categoricalMode,
    "q47_semi_anti_join" -> semiAntiJoin,
    "q78_kmv_distinct" -> kmvDistinct,
    "q88_sample_quantiles" -> sampleQuantiles)

  override def oracles: Map[String, String] = Map(
    "q131_kmv_set_ops" -> kmvSetOpsSql,
    "q121_k_anonymity" -> kAnonymitySql,
    "q149_l_diversity" -> lDiversitySql,
    "q164_t_closeness" -> tClosenessSql,
    "q153_mann_kendall" -> mannKendallSql,
    "q154_cusum_changepoint" -> cusumChangepointSql,
    "q19_cast_join" -> castJoinSql,
    "q42_categorical_mode" -> categoricalModeSql,
    "q47_semi_anti_join" -> semiAntiJoinSql,
    "q05_topk_customers" -> topkCustomersSql,
    "q06_pagination" -> paginationSql,
    "q07_distinct_entities" -> distinctEntitiesSql,
    "q08_value_counts" -> valueCountsSql,
    "q09_null_profile" -> nullProfileSql,
    "q10_stats_profile" -> statsProfileSql,
    "q11_corr_matrix" -> corrMatrixSql,
    "q12_quantile_buckets" -> quantileBucketsSql,
    "q13_reconciliation" -> reconciliationSql,
    "q14_latest_wins_upsert" -> latestWinsUpsertSql,
    "q78_kmv_distinct" -> kmvDistinctSql,
    "q95_rfm_segments" -> rfmSegmentsSql,
    "q159_rfm_sketch" -> rfmSketchSegmentsSql,
    "q88_sample_quantiles" -> sampleQuantilesSql)
}
