package graft.tools

import graft.operators.{Forecast, GlobalAR}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Diagnostic: phase-level wall-times inside one global_ar refit
  * (panel window build, 20-sum fit aggregation, step/hist output) to
  * locate the cost inside the backtest's long pole. Not part of the
  * contract surface. */
object ArPhaseProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for ((label, series0, step) <- Seq(
      ("daily-supplier", Forecast.dailySeries(spark, dir), 1),
      ("weekly-product", Forecast.weeklyAt(spark, dir, "product"), 7))) {
      println(s"== $label ==")
      val dateCol = if (step == 1) "ds" else "week"
      val series = series0.select(col("entity"), col(dateCol).as("ds"), col("y"))
        .persist()
      t("series count")(series.count())
      val w = Window.partitionBy(col("entity")).orderBy(col("ds"))
      val feat = series
        .withColumn("lag_1", lag(col("y"), 1).over(w))
        .withColumn("lag_7", lag(col("y"), 7).over(w))
        .withColumn("lag_14", lag(col("y"), 14).over(w))
        .withColumn("roll7", sum(col("y").cast(LongType))
          .over(w.rowsBetween(-7, -1)).cast(DoubleType) / lit(7.0))
        .filter(col("lag_14").isNotNull)
      t("panel windows only")(feat.select(count(lit(1))).head())
      t("panel + long sums only")(feat.agg(
        sum(col("lag_1").cast(LongType)), sum((col("lag_1") * col("lag_7")).cast(LongType)),
        sum((col("lag_1") * col("lag_14")).cast(LongType))).head())
      t("panel + 6 decimal sums")(feat.agg(
        sum((col("roll7")).cast(DecimalType(38, 8))),
        sum((col("roll7") * col("lag_1")).cast(DecimalType(38, 8))),
        sum((col("roll7") * col("lag_7")).cast(DecimalType(38, 8))),
        sum((col("roll7") * col("lag_14")).cast(DecimalType(38, 8))),
        sum((col("roll7") * col("roll7")).cast(DecimalType(38, 8))),
        sum((col("roll7") * col("y")).cast(DecimalType(38, 8)))).head())
      t("full globalArCore (prod fit)")(
        GlobalAR.profileCore(series, step).count())
      series.unpersist()
    }
    spark.stop()
  }
}
