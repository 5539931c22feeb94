package graft.tools

import graft.operators.{Backtest, Forecast}
import org.apache.spark.sql.SparkSession

/** Diagnostic: wall-time each backtest (granularity, level, model)
  * refit in isolation, serially, to find the long pole of the
  * prep_forecast_backtest bench stage. Not part of the contract
  * surface. */
object BacktestProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    Forecast.prepareArtifacts(spark, dir)
    println(f"series prep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Backtest.profileAll(spark, dir)
    spark.stop()
  }
}
