package graft.tools

/** Diagnostic: decompose q90/q82's per-run wall — cached-artifact
  * counts, noop-write of progressively larger plan prefixes — to find
  * which stage of the champion-application path pays the seconds.
  * Not part of the contract surface. */
object ChampProfile {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"CHAMP $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    graft.Bench.prepStages.toMap.apply("prep_demand_series")(spark, sfDir)
    graft.Bench.prepStages.toMap.apply("prep_forecast_backtest")(spark, sfDir)
    graft.Bench.prepStages.toMap.apply("prep_full_dispatch")(spark, sfDir)
    graft.Bench.prepStages.toMap.apply("prep_forecast_dispatch")(spark, sfDir)
    import org.apache.spark.sql.functions._
    val q82 = graft.SparkEntry.queries("q82_model_selection")(spark, sfDir)
    val q90 = graft.SparkEntry.queries("q90_champion_forecasts")(spark, sfDir)
    val q66 = graft.SparkEntry.queries("q66_forecast_dispatch")(spark, sfDir)
    t("raw range count")(spark.range(1000000).count())
    t("raw range count again")(spark.range(1000000).count())
    val champCached = q82.queryExecution.optimizedPlan.collectLeaves().toString
    println("  q82 leaves: " + champCached.take(300))
    t("q82 count")(println("  rows=" + q82.count()))
    t("q82 count again")(q82.count())
    t("q82 noop")(q82.write.format("noop").mode("overwrite").save())
    t("q82 noop again")(q82.write.format("noop").mode("overwrite").save())
    t("q66 rows")(println("  rows=" + q66.count()))
    t("q90 count")(println("  rows=" + q90.count()))
    t("q90 noop")(q90.write.format("noop").mode("overwrite").save())
    t("q90 no-sort noop")(q90.sortWithinPartitions(col("entity_id"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
