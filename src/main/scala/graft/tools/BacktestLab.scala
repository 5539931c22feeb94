package graft.tools

import graft.operators.{Backtest, Forecast}
import org.apache.spark.sql.SparkSession

/** Diagnostic: wall-time each backtest GROUP (split persist + 4
  * overlapped model refits) in isolation, to separate per-group floors
  * from cross-group overlap in the prep_forecast_backtest stage. Not
  * part of the contract surface. */
object BacktestLab {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    Forecast.prepareArtifacts(spark, dir)
    println(f"series prep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    if (args.contains("--phases")) Backtest.labPhases(spark, dir)
    else Backtest.labGroups(spark, dir)
    spark.stop()
  }
}
