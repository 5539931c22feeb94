package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer for the driver-generated TPC-H-ish testdata
  * (TESTDATA.md). Role mapping onto the reference's supply-chain model
  * (FIXTURES.md §B): orders+lineitem = bronze.supply_orders fact,
  * part = bronze.products, supplier = bronze.suppliers,
  * customer+nation+region = bronze.retail_stores + region dims.
  *
  * Reads are plain parquet scans so Catalyst pushes filters/projections
  * into the scan (verified via .explain: PushedFilters/ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Lazy parquet reader — metadata-only until an action runs. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos and floor-divide to micros
    * (integer div — a double division would lose precision at 1.7e18).
    * Matches DuckDB's CAST(ts_ns AS TIMESTAMP) truncation. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Register all tables as temp views so `spark.sql(...)` works —
    * the reference's ad-hoc SQL runner surface (SURVEY §2.1 S13,
    * reference app.py:655-682). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
