package graft.operators

import graft.{QueryModule, Tables}
import graft.util.Parity._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's 12 named gold assertion checks
  * (gold/gold_builder.py:465-527) as a reusable DQ module: each check
  * is a violation-count query; pass ⇔ zero violations. This is
  * product surface, not test scaffolding (SURVEY §5) — the checks run
  * over the live gold marts.
  */
object DqChecks extends QueryModule {

  /** q38 — all checks, one row each: name, violations, passed. */
  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    val sales = GoldMarts.monthlySales(s, dir)
    val sup = GoldMarts.supplierMonthly(s, dir)

    def check(df: DataFrame, name: String, violation: Column): DataFrame =
      df.agg(count(when(violation, 1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"),
          (col("violations") === 0).as("passed"))

    val anchor = lit("2002-01-01").cast(DateType)
    val checks = Seq(
      check(sales, "sales_revenue_non_negative", col("total_revenue") < 0),
      check(sales, "sales_no_future_months", col("sales_month") > anchor),
      check(sales, "sales_quantity_positive", col("total_quantity") <= 0),
      check(sales, "sales_orders_positive", col("total_orders") <= 0),
      check(sales, "sales_revenue_per_unit_consistent",
        abs(col("revenue_per_unit") * col("total_quantity") - col("total_revenue")) > lit(1.0) * col("total_quantity")),
      check(sales, "sales_active_customers_bound", col("active_customers") > col("total_orders")),
      check(sup, "supplier_lead_time_non_negative", col("avg_lead_time_days") < 0),
      check(sup, "supplier_on_time_rate_bounds", col("on_time_rate") < 0 || col("on_time_rate") > 100),
      check(sup, "supplier_in_full_rate_bounds", col("in_full_rate") < 0 || col("in_full_rate") > 100),
      check(sup, "supplier_quantity_positive", col("total_quantity") <= 0),
      check(sup, "supplier_value_non_negative", col("total_value") < 0),
      check(sup, "supplier_lines_cover_orders", col("total_orders") > col("total_lines")))
    checks.reduce(_.unionByName(_)).orderBy(col("check_name"))
  }

  private val dqChecksSql = {
    // run the checks over the same mart SQL the oracle uses for q01/q03
    val salesCte = GoldMarts.oracles("q01_monthly_sales")
    val supCte = GoldMarts.oracles("q03_supplier_monthly")
    def c(src: String, name: String, violation: String): String =
      s"""SELECT '$name' AS check_name, count(CASE WHEN $violation THEN 1 END) AS violations,
         |       count(CASE WHEN $violation THEN 1 END) = 0 AS passed FROM $src""".stripMargin
    s"""WITH sales AS ($salesCte),
       |sup AS ($supCte)
       |SELECT * FROM (
       |${c("sales", "sales_revenue_non_negative", "total_revenue < 0")}
       |UNION ALL
       |${c("sales", "sales_no_future_months", "sales_month > DATE '2002-01-01'")}
       |UNION ALL
       |${c("sales", "sales_quantity_positive", "total_quantity <= 0")}
       |UNION ALL
       |${c("sales", "sales_orders_positive", "total_orders <= 0")}
       |UNION ALL
       |${c("sales", "sales_revenue_per_unit_consistent", "abs(revenue_per_unit * total_quantity - total_revenue) > 1.0 * total_quantity")}
       |UNION ALL
       |${c("sales", "sales_active_customers_bound", "active_customers > total_orders")}
       |UNION ALL
       |${c("sup", "supplier_lead_time_non_negative", "avg_lead_time_days < 0")}
       |UNION ALL
       |${c("sup", "supplier_on_time_rate_bounds", "on_time_rate < 0 OR on_time_rate > 100")}
       |UNION ALL
       |${c("sup", "supplier_in_full_rate_bounds", "in_full_rate < 0 OR in_full_rate > 100")}
       |UNION ALL
       |${c("sup", "supplier_quantity_positive", "total_quantity <= 0")}
       |UNION ALL
       |${c("sup", "supplier_value_non_negative", "total_value < 0")}
       |UNION ALL
       |${c("sup", "supplier_lines_cover_orders", "total_orders > total_lines")})
       |ORDER BY check_name""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_dq_checks" -> dqChecks)

  override def oracles: Map[String, String] = Map(
    "q38_dq_checks" -> dqChecksSql)
}
