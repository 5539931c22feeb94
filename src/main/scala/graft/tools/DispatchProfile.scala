package graft.tools

import org.apache.spark.sql.functions._

/** Per-branch materialization profile for the full-dispatch artifact:
  * times each (model, granularity, level) branch's own noop write
  * after the series artifacts exist, so the expensive branch inside
  * prep_full_dispatch's single union job is identifiable.
  * `SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *  sbt "runMain graft.tools.DispatchProfile"` */
object DispatchProfile {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"DPROF $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // same pre-state as the bench: series + backtest + q66 artifacts
    timed("prep_demand_series")(graft.operators.Forecast.prepareArtifacts(spark, sfDir))
    timed("prep_forecast_backtest")(graft.operators.Backtest.prepareArtifacts(spark, sfDir))
    timed("prep_forecast_dispatch")(graft.operators.Forecasting.forecastDispatch(spark, sfDir))
    val fc = graft.operators.Forecasting
    for (lv <- Seq("product", "region"); m <- fc.models.keys.toSeq.sorted)
      timed(s"weekly:$lv:$m") {
        fc.branchForProfile(spark, sfDir, lv, m)
          .write.format("noop").mode("overwrite").save()
      }
    for (m <- fc.models.keys.toSeq.sorted)
      timed(s"daily:supplier:$m") {
        fc.run(spark, sfDir, m, "daily")
          .write.format("noop").mode("overwrite").save()
      }
    timed("full union+repartition+count") {
      graft.operators.Forecasting.fullDispatch(spark, sfDir).count()
    }
    spark.stop()
  }
}
