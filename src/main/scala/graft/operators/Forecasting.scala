package graft.operators

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-run model dispatch — the reference's `run_forecasting_pipeline`
  * (forecasting.py:168-211,434-449) selects ONE model per run by name
  * and emits every model's rows through the single `gold.forecasts`
  * interface (ds / yhat / yhat_lower / yhat_upper / granularity /
  * model / level / entity_id, forecasting.py:67-81; run_id is stamped
  * by the caller's run-scoped overwrite, as in Pipeline.runGold).
  *
  * Model substitutions are those documented in SURVEY §7.4 (no JVM
  * Prophet/SARIMAX/LightGBM): "linear" is the closed-form OLS trend,
  * "seasonal_naive" the period-4 replay, "global_ar" the pooled
  * 5-feature autoregressive model — each oracle-verified on its own
  * (q36/q37/q50/q55); q66 verifies the DISPATCH: all models conformed
  * to the one output interface, model column included.
  *
  * Scale: dispatch adds nothing to the plans — it conforms column
  * shape only; both series granularities stay shared artifacts.
  */
object Forecasting extends QueryModule {

  /** model -> supported granularities (the reference gates the same
    * way: prophet/sarimax are per-granularity, forecasting.py:177). */
  val models: Map[String, Seq[String]] = Map(
    "linear" -> Seq("weekly"),
    "seasonal_naive" -> Seq("weekly"),
    "global_ar" -> Seq("daily", "weekly"))

  /** The granularity a model runs at when the caller doesn't choose:
    * global_ar's native horizon is daily; the other models are
    * weekly-only. Shared by every entry point (CLI and programmatic)
    * so "linear" without a granularity never dispatches to an
    * unsupported (linear, daily) pair. */
  def defaultGranularity(model: String): String =
    if (model == "global_ar") "daily" else "weekly"

  /** Conform a bare (entity, ds, yhat, bounds) frame to the reference
    * forecasts interface. */
  private def conform(df: DataFrame, model: String, granularity: String): DataFrame =
    df.select(
      col("entity").cast(StringType).as("entity_id"),
      col("ds"), col("yhat"), col("yhat_lower"), col("yhat_upper"),
      lit(granularity).as("granularity"),
      lit(model).as("model"),
      lit("supplier").as("level"))

  private def unsupported(model: String, granularity: String): Nothing =
    throw new IllegalArgumentException(
      s"no forecasting model '$model' at granularity '$granularity' — " +
        s"supported: ${models.toSeq.sortBy(_._1).map { case (m, gs) => s"$m(${gs.mkString("/")})" }.mkString(", ")}")

  /** Dispatch over the shared series artifacts (query surface /
    * ad-hoc callers). */
  def run(s: SparkSession, dir: String, model: String,
      granularity: String = "weekly"): DataFrame = (model, granularity) match {
    case ("linear", "weekly") =>
      conform(Forecast.forecastLinear(s, dir), "linear", "weekly")
    case ("seasonal_naive", "weekly") =>
      conform(Forecast.forecastSeasonalNaive(s, dir), "seasonal_naive", "weekly")
    case ("global_ar", "daily") => GlobalAR.forecastGlobalAr(s, dir)
    case ("global_ar", "weekly") => GlobalAR.forecastGlobalArWeekly(s, dir)
    case _ => unsupported(model, granularity)
  }

  /** Dispatch over a caller-supplied lineitem frame — the Pipeline
    * path: forecasts derive from the WRITTEN silver.lineitem, like
    * every other gold table (medallion lineage). `materialize` pins
    * the derived series across the model's multiple passes. */
  def runOver(lineitem: DataFrame, model: String, granularity: String,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    lazy val weekly = materialize(Forecast.weeklyOver(lineitem))
    (model, granularity) match {
      case ("linear", "weekly") =>
        conform(Forecast.forecastLinearOver(weekly), "linear", "weekly")
      case ("seasonal_naive", "weekly") =>
        conform(Forecast.forecastSeasonalNaiveOver(weekly), "seasonal_naive", "weekly")
      case ("global_ar", "daily") =>
        GlobalAR.globalArCore(materialize(Forecast.dailySeriesOver(lineitem)),
          stepDays = 1, granularity = "daily")
      case ("global_ar", "weekly") =>
        GlobalAR.globalArCore(
          weekly.select(col("entity"), col("week").as("ds"), col("y")),
          stepDays = 7, granularity = "weekly")
      case _ => unsupported(model, granularity)
    }
  }

  /** q66 — the dispatch surface end-to-end: every weekly-capable model
    * through the one forecasts interface, distinguished by the model
    * column. */
  def forecastDispatch(s: SparkSession, dir: String): DataFrame =
    run(s, dir, "linear")
      .unionByName(run(s, dir, "seasonal_naive"))
      .unionByName(run(s, dir, "global_ar", "weekly"))
      .orderBy(col("model"), col("entity_id"), col("ds"))

  private val forecastDispatchSql = {
    def conformSql(inner: String, model: String) =
      s"""SELECT CAST(entity AS VARCHAR) AS entity_id, ds, yhat, yhat_lower, yhat_upper,
         |       'weekly' AS granularity, '$model' AS model, 'supplier' AS level
         |FROM ($inner)""".stripMargin
    val globalWeekly = GlobalAR.globalArSql(
      s"SELECT entity, week AS ds, y FROM (${Forecast.weeklySql})",
      stepDays = 7, granularity = "weekly")
    s"""${conformSql(Forecast.forecastLinearSql, "linear")}
       |UNION ALL
       |${conformSql(Forecast.forecastSeasonalNaiveSql, "seasonal_naive")}
       |UNION ALL
       |SELECT * FROM ($globalWeekly)
       |ORDER BY model, entity_id, ds""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_forecast_dispatch" -> forecastDispatch)

  override def oracles: Map[String, String] = Map(
    "q66_forecast_dispatch" -> forecastDispatchSql)
}
