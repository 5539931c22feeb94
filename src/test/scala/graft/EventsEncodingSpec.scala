package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Tables.events must normalize BOTH physical encodings the testdata
  * has shipped for events.ts — TIMESTAMP(MICROS, isAdjustedToUTC=
  * false) (read by Spark as TIMESTAMP_NTZ) and the older
  * TIMESTAMP(NANOS) (read as raw longs under the legacy flag) — to
  * the same TimestampType column with identical instants. A testdata
  * regeneration flipped the encoding once mid-build and took down all
  * seven events queries; this locks the reader against both. */
class EventsEncodingSpec extends SparkSpec {

  private def writeFixture(dir: String, tsExpr: String): String = {
    val base = spark.range(0, 100).select(
      col("id").as("event_id"),
      expr("timestamp_micros(cast(1500000000000000 + id * 137000000 as bigint))").as("ts_src"),
      (col("id") % 7).as("user_id"),
      lit("view").as("event_type"),
      lit(1.5).as("value"),
      lit("{}").as("props"))
    base.select(col("event_id"), expr(tsExpr).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("NTZ-micros and nanos-as-long encodings read identically") {
    val tmp = java.nio.file.Files.createTempDirectory("events-enc").toString
    // current generation: naive micros timestamp (Spark: TIMESTAMP_NTZ)
    val ntzDir = writeFixture(s"$tmp/ntz", "cast(ts_src as timestamp_ntz)")
    // older generation: raw nanosecond longs (what the legacy
    // TIMESTAMP(NANOS) pages decode to under nanosAsLong)
    val nanosDir = writeFixture(s"$tmp/nanos", "unix_micros(ts_src) * cast(1000 as bigint)")

    val ntz = Tables.events(spark, ntzDir)
    val nanos = Tables.events(spark, nanosDir)
    assert(ntz.schema("ts").dataType == TimestampType)
    assert(nanos.schema("ts").dataType == TimestampType)

    val a = ntz.select(col("event_id"), col("ts")).orderBy(col("event_id")).collect()
    val b = nanos.select(col("event_id"), col("ts")).orderBy(col("event_id")).collect()
    assert(a.length == 100 && b.length == 100)
    assert(a.sameElements(b))
  }

  test("a native TimestampType ts passes through untouched") {
    val tmp = java.nio.file.Files.createTempDirectory("events-enc-tz").toString
    val tzDir = writeFixture(s"$tmp/tz", "ts_src")
    val tz = Tables.events(spark, tzDir)
    assert(tz.schema("ts").dataType == TimestampType)
    assert(tz.count() == 100)
  }
}
