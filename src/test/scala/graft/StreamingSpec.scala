package graft

import graft.streaming.StreamingPipeline
import graft.streaming.StreamingPipeline.{Event, SessionOut}
import graft.operators.EventOps
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming-vs-batch equivalence: the Structured Streaming pipeline
  * over a file source must produce the same answers as the batch
  * operators over the same rows. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf = Tables.events(spark, sf0001)

  test("streaming windowed counts == batch windowed counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    eventsDf.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingPipeline.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("win_out")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3), r.getDouble(4)))
    val batch = EventOps.eventWindows(spark, sf0001)
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stateful streaming sessionization == batch sessionization") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val ev = eventsDf
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
    // sentinel event per user, one day after their last event, to
    // drain the final open session from state
    val sentinels = eventsDf.groupBy($"user_id")
      .agg(max($"ts").as("last_ts"))
      .select(lit(-1L).as("event_id"),
        ($"last_ts" + expr("interval 1 day")).as("ts"),
        $"user_id", lit("__flush__").as("event_type"), lit(0.0).as("value"))
      .as[Event]
    ev.unionByName(sentinels).write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in").as[Event]
    val q = StreamingPipeline.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_out")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    val batch = EventOps.sessionize(spark, sf0001)
      .orderBy("user_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
    assert(streamed.toSeq == batch.toSeq)
  }
}
