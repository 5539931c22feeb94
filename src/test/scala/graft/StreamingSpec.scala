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

  test("streaming vector ingest against the frozen k-means index == batch assignment") {
    // serving shape: the trained index (q108's frozen centroids) loads
    // as literal metadata; the full embedding set then arrives AS A
    // STREAM and every vector must land in the same cell with the same
    // cosine the batch fit assigned
    val (batchAsg, cents) = graft.operators.VectorOps.kmeansFit(spark, sf0001)
    val index = cents.collect().map(r => (r.getAs[Long]("cell"),
      r.getAs[Seq[Double]]("cv").toVector: Seq[Double], r.getAs[Double]("cnorm2"))).toSeq
    assert(index.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-vecs").toString
    Tables.t(spark, sf0001, "embeddings").select("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingPipeline.assignStream(stream, index)
      .writeStream.outputMode("append")
      .format("memory").queryName("vec_assign")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("vec_assign")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = batchAsg.select("vec_id", "cell", "csim")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed.size == batch.size && streamed.nonEmpty)
    assert(streamed == batch,
      "streaming assignment diverged from the batch fit")
  }

  test("chained stateful ops: watermarked dedup -> DAU windows == batch q94 dau") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dau").toString
    val base = eventsDf.select("event_id", "ts", "user_id", "event_type", "value")
    base.write.parquet(s"$dir/in/b1")
    // sentinel batch past every horizon: advances the watermark so all
    // real day windows close (its own window never does)
    base.agg(max($"ts").as("mx"))
      .select(lit(-1L).as("event_id"), ($"mx" + expr("INTERVAL 5 DAYS")).as("ts"),
        lit(-1L).as("user_id"), lit("drain").as("event_type"), lit(0.0).as("value"))
      .write.parquet(s"$dir/in/b2")
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
    val q = StreamingPipeline.dauStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dau_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dau_out")
      .collect().map(r => (r.getDate(0), r.getLong(1))).sortBy(_._1.toString)
    val batch = EventOps.stickiness(spark, sf0001)
      .select("ds", "dau")
      .collect().map(r => (r.getDate(0), r.getLong(1))).sortBy(_._1.toString)
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
  }

  test("streaming sliding windows == batch q100 sliding windows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slide").toString
    eventsDf.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingPipeline.slidingCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("slide_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getLong(3), r.getDouble(4))
    val streamed = spark.table("slide_out").collect().map(key).sorted
    val batch = EventOps.slidingWindows(spark, sf0001)
      .select("window_start", "window_end", "event_type", "n_events", "total_value")
      .collect().map(key).sorted
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    val base = eventsDf.select("event_id", "ts", "user_id", "event_type", "value").limit(50)
    // duplicate every event once (same id) — streaming dedup must halve it
    base.unionByName(base).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingPipeline.dedupStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").count() == 50)
    assert(spark.table("dedup_out").select("event_id").distinct().count() == 50)
  }

  test("streaming bronze ingest lands micro-batches via the batch upsert path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    val batch1 = eventsDf.select("event_id", "ts", "user_id", "event_type", "value").limit(30)
    batch1.write.parquet(s"$dir/in/b1")
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
    val q = StreamingPipeline.bronzeIngest(stream, store, "events", s"$dir/ckpt")
    q.processAllAvailable()
    assert(store.table("bronze", "events").count() == 30)
    // second micro-batch: 10 overlapping ids + 10 new -> idempotent merge
    val batch2 = eventsDf.select("event_id", "ts", "user_id", "event_type", "value")
      .filter($"event_id" >= 20 && $"event_id" < 40)
    batch2.write.parquet(s"$dir/in/b2")
    q.processAllAvailable(); q.stop()
    assert(store.table("bronze", "events").count() == 40)
  }

  test("streaming CDC ingest == one-shot batch replay of the full log") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    def mkStore(sub: String) = new graft.sources.LayerStore(spark, s"$dir/$sub")
    val log1 = Seq((1L, "a", "I", 1L), (2L, "b", "I", 2L), (3L, "c", "I", 3L))
    val log2 = Seq((1L, "a2", "U", 10L), (2L, "b", "D", 11L), (4L, "d", "I", 12L),
      (9L, "x", "D", 13L)) // delete lands a MICRO-BATCH after its insert
    def df(rows: Seq[(Long, String, String, Long)]) = rows.toDF("k", "v", "op", "lsn")
    df(log1).coalesce(1).write.parquet(s"$dir/in/b1")
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    df(log2).coalesce(1).write.parquet(s"$dir/in/b2")
    def run(sub: String, glob: String) = {
      val st = mkStore(sub)
      val q = StreamingPipeline.cdcIngest(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(glob),
        st, "silver", "t", Seq("k"), "lsn", s"$dir/ckpt-$sub")
      q.processAllAvailable(); q.stop()
      st.cdcTable("silver", "t", "lsn").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    }
    val viaStream = run("stream", s"$dir/in/*")
    // one-shot batch replay of the concatenated log on a fresh store
    val batchStore = mkStore("batch")
    batchStore.applyCdc("silver", "t", df(log1 ++ log2), Seq("k"), "lsn")
    val viaBatch = batchStore.cdcTable("silver", "t", "lsn").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaStream == viaBatch && viaStream == Seq((1L, "a2"), (3L, "c"), (4L, "d")),
      s"stream $viaStream vs batch $viaBatch")
    // OUT-OF-ORDER delivery: the later-sequence file lands a
    // micro-batch FIRST (file sources order by mtime, not log
    // position) — sequence watermarks + tombstones must still
    // converge to the same table
    df(log2).coalesce(1).write.parquet(s"$dir/ooo/a1")
    df(log1).coalesce(1).write.parquet(s"$dir/ooo/a2")
    val viaOoo = run("ooo", s"$dir/ooo/*")
    assert(viaOoo == viaBatch,
      s"out-of-order micro-batches diverged: $viaOoo vs $viaBatch")
  }

  test("watermark drops late data in append mode") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toString
    def ts(m: Int, s: Int = 0) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")
    def writeBatch(n: Int, rows: Seq[Event]): Unit =
      rows.toDF().write.parquet(s"$dir/in/b$n")
    // batch 1: three events inside window [00:00, 00:05)
    writeBatch(1, Seq(Event(1, ts(1), 1, "view", 1.0),
      Event(2, ts(2), 1, "view", 1.0), Event(3, ts(3), 1, "view", 1.0)))
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
    val q = StreamingPipeline.windowedCounts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    // batch 2: an event at 00:55 pushes the watermark (10 min lag) to
    // 00:45 — the first window finalizes and emits
    writeBatch(2, Seq(Event(4, ts(55), 1, "view", 1.0)))
    q.processAllAvailable()
    // batch 3: a LATE event back inside the finalized window -> dropped
    writeBatch(3, Seq(Event(5, ts(4), 1, "view", 1.0)))
    q.processAllAvailable()
    q.stop()
    val w1 = spark.table("late_out")
      .filter($"window_start" === ts(0)).select("n_events").collect()
    assert(w1.length == 1 && w1.head.getLong(0) == 3,
      "late event must not re-open the finalized window")
    // contrast: batch semantics (no watermark) count all 4
    val batchCount = spark.read.parquet(s"$dir/in/*")
      .groupBy(window($"ts", "5 minutes")).count()
      .filter($"window.start" === ts(0)).select("count").as[Long].head()
    assert(batchCount == 4)
  }

  test("stream-stream interval join == independent batch join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjoin").toString
    eventsDf.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingPipeline.purchaseViewJoin(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(3))
    val streamed = spark.table("ssjoin_out").collect().map(key).sorted
    // independently-written batch join (not the shared function)
    val e = eventsDf
    val batch = e.filter($"event_type" === "purchase").as("p")
      .join(e.filter($"event_type" === "view").as("v"),
        $"p.user_id" === $"v.user_id" && $"v.ts" <= $"p.ts" &&
          $"v.ts" >= $"p.ts" - expr("INTERVAL 1 HOUR"))
      .select($"p.event_id", $"v.event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
  }

  /** A 1-row far-future batch: advances the global watermark so every
    * buffered event in the watermark-ordered twins finalizes (the
    * no-data micro-batch then fires the event-time timeouts). */
  private def withSentinel(base: org.apache.spark.sql.DataFrame, pastHorizon: String) =
    base.unionByName(base.agg(max($"ts").as("mx"))
      .select(lit(-1L).as("event_id"), ($"mx" + expr(pastHorizon)).as("ts"),
        lit(-99L).as("user_id"), lit("drain").as("event_type"), lit(0.0).as("value")))

  test("stateful streaming funnel == batch funnel stage counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    withSentinel(eventsDf.select("event_id", "ts", "user_id", "event_type", "value"),
        "INTERVAL 1 DAY")
      .write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in").as[Event]
    val q = StreamingPipeline.funnelStages(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnel_out")
      .groupBy("stage").agg(count(lit(1)).as("users"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    val batch = EventOps.funnel(spark, sf0001)
      .select("stage", "users")
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
    // each user reaches each stage at most once
    val perUser = spark.table("funnel_out")
      .groupBy("user_id", "stage").count().filter($"count" > 1).count()
    assert(perUser == 0)
  }

  test("stateful streaming cohort activity == batch cohort retention (q74)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cohort").toString
    withSentinel(eventsDf.select("event_id", "ts", "user_id", "event_type", "value"),
        "INTERVAL 1 DAY")
      .write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in").as[Event]
    val q = StreamingPipeline.cohortActivity(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("cohort_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    // the retention matrix derived from the streamed activity facts:
    // active_users per (cohort_week, offset); cohort_size = the
    // offset-0 count (every user's first emission). Computed over the
    // collected facts — a self-join on one memory-sink table trips
    // conflicting-attribute resolution.
    val facts = spark.table("cohort_out")
      .filter($"user_id" >= 0) // the drain sentinel starts a cohort of its own
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getInt(2)))
    val sizes = facts.filter(_._3 == 0).groupBy(_._2).view.mapValues(_.length).toMap
    val streamed = facts.groupBy(f => (f._2, f._3)).toSeq
      .map { case ((cw, off), fs) =>
        (cw, off, fs.length.toLong, sizes(cw).toLong,
          fs.length.toDouble / sizes(cw).toDouble) }
      .sortBy(t => (t._1, t._2))
    val batch = EventOps.cohortRetention(spark, sf0001)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(streamed == batch.toSeq && streamed.nonEmpty)
    // the dedup contract: at most one fact per (user, offset)
    assert(facts.groupBy(f => (f._1, f._3)).forall(_._2.length == 1))
  }

  test("streaming restart from checkpoint resumes exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val half = eventsDf.select("event_id", "ts", "user_id", "event_type", "value")
    half.filter($"event_id" % 2 === 0).write.parquet(s"$dir/in/b1")
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    def start() = StreamingPipeline.windowedCounts(
        spark.readStream.schema(schema).parquet(s"$dir/in/*"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("restart_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // simulated crash/redeploy between micro-batches
    half.filter($"event_id" % 2 === 1).write.parquet(s"$dir/in/b2")
    val q2 = start() // same checkpoint: must resume, not reprocess
    q2.processAllAvailable()
    q2.stop()
    val streamed = spark.table("restart_out")
      .agg(sum($"n_events"), count(lit(1))).collect().head
    val batch = StreamingPipeline.windowedCounts(eventsDf)
      .agg(sum($"n_events"), count(lit(1))).collect().head
    assert(streamed == batch,
      "post-restart totals must equal one continuous run over all rows")
  }

  test("stateful streaming demand anomalies == batch q85") {
    import StreamingPipeline.DailyPoint
    val dir = java.nio.file.Files.createTempDirectory("graft-anom").toString
    val series = graft.operators.Forecast.dailySeries(spark, sf0001)
      .select(col("entity"), col("ds"), col("y"))
    // far-future sentinel day: advances the watermark past every real
    // day + the 3-day delay so the ordered harness finalizes them all
    series.unionByName(series.agg(max($"ds").as("mx"))
        .select(lit(-1L).as("entity"),
          date_add($"mx", 40).as("ds"), lit(0.0).as("y")))
      .write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in").as[DailyPoint]
    val q = StreamingPipeline.demandAnomalies(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("anom_out")
      .filter($"entity" >= 0)
      .orderBy("entity", "ds").collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q85_demand_anomalies")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stateful streaming sessionization == batch sessionization") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    // ONE global far-future sentinel: the WATERMARK itself flushes
    // every user's final open session (no per-user drain events)
    withSentinel(eventsDf.select("event_id", "ts", "user_id", "event_type", "value"),
        "INTERVAL 2 DAYS")
      .write.mode("overwrite").parquet(s"$dir/in")
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
      .filter($"user_id" >= 0) // the sentinel's own 1-event session
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    val batch = EventOps.sessionize(spark, sf0001)
      .orderBy("user_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3),
        r.getLong(4), r.getDouble(5)))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stateful streaming conversion == batch q96 rows (watermark-drained)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-conv").toString
    val base = eventsDf.select("event_id", "ts", "user_id", "event_type", "value")
    // ONE global sentinel — the watermark itself expires unconverted
    // views now (no per-user drain events needed)
    withSentinel(base, "INTERVAL 2 HOURS").write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in").as[Event]
    val q = StreamingPipeline.conversionStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("conv_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getTimestamp(4)), Option(r.get(5)).map(_.asInstanceOf[Long]))
    val streamed = spark.table("conv_out")
      .select("view_id", "user_id", "view_ts", "next_purchase_id",
        "next_purchase_ts", "latency_micros")
      .collect().map(key).sortBy(_._1)
    val batch = EventOps.viewToPurchase(spark, sf0001).collect().map(key).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
    // both conversion outcomes exercised by the replay
    assert(streamed.exists(_._4.isDefined) && streamed.exists(_._4.isEmpty))
  }

  test("stateful streaming attribution == batch q89 rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    withSentinel(eventsDf.select("event_id", "ts", "user_id", "event_type", "value"),
        "INTERVAL 8 DAYS")
      .write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in").as[Event]
    val q = StreamingPipeline.attributionStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3),
        r.getString(4), Option(r.getTimestamp(5)), r.getString(6), Option(r.getTimestamp(7)))
    val streamed = spark.table("attr_out")
      .select("event_id", "user_id", "purchase_ts", "touches_7d",
        "first_touch_type", "first_touch_ts", "last_touch_type", "last_touch_ts")
      .collect().map(key).sortBy(_._1)
    val batch = EventOps.attribution(spark, sf0001).collect().map(key).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
    // attribution classes are all exercised by the replay
    val kinds = streamed.map(_._7).toSet
    assert(kinds.contains("direct") && (kinds.contains("click") || kinds.contains("view")))
  }

  test("cross-batch OUT-OF-ORDER replay: funnel/attribution/conversion stay event-time exact") {
    // arrival order deliberately contradicts event-time order ACROSS
    // micro-batches — the divergence the old NoTimeout twins
    // documented as a caveat; watermarkOrdered must make it exact.
    //   user 1: click(00:02) arrives a batch BEFORE view(00:01) —
    //     event-time semantics still count stages 1→2→3
    //   user 2: purchase(00:05) arrives a batch before its view(00:04)
    //     — the purchase must still attribute to the view
    //   user 3: a lone view no later event ever follows — the
    //     WATERMARK must flush its null conversion row, no sentinel
    //     for user 3
    val dir = java.nio.file.Files.createTempDirectory("graft-ooo").toString
    def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-03-01 00:$m%02d:00")
    def writeBatch(n: Int, rows: Seq[Event]): Unit =
      rows.toDF().write.parquet(s"$dir/in/b$n")
    writeBatch(1, Seq(
      Event(102, ts(2), 1, "click", 1.0),
      Event(205, ts(5), 2, "purchase", 5.0),
      Event(301, ts(1), 3, "view", 1.0)))
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    def run[T](name: String, build: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[T]): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*").as[Event]
      val q = build(stream).writeStream.outputMode("append")
        .format("memory").queryName(name)
        .option("checkpointLocation", s"$dir/ckpt-$name").start()
      q.processAllAvailable(); q.stop()
    }
    // batch 2 lands the EARLIER events after batch 1 already arrived
    writeBatch(2, Seq(
      Event(101, ts(1), 1, "view", 1.0),
      Event(204, ts(4), 2, "view", 1.0),
      Event(103, ts(3), 1, "purchase", 3.0)))
    // batch 3: global sentinel 2 h out — watermark passes every real
    // event AND every 1-h conversion window
    writeBatch(3, Seq(Event(-1, Timestamp.valueOf("2024-03-01 02:00:00"), 99, "drain", 0.0)))

    run("ooo_funnel", StreamingPipeline.funnelStages(_))
    val funnel = spark.table("ooo_funnel")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(3))).sorted
    assert(funnel.toSeq == Seq(
      (1L, 1, ts(1)), (1L, 2, ts(2)), (1L, 3, ts(3)), // full funnel despite reordering
      (2L, 1, ts(4)), (3L, 1, ts(1))),
      s"funnel diverged under out-of-order arrival: ${funnel.mkString(", ")}")

    run("ooo_attr", StreamingPipeline.attributionStream(_))
    val attr = spark.table("ooo_attr")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getString(4), r.getString(6))).sorted
    assert(attr.toSeq == Seq(
      (103L, 2L, "view", "click"), // u1: view+click precede in event time
      (205L, 1L, "view", "view")), // u2: the late-arriving view still attributes
      s"attribution diverged: ${attr.mkString(", ")}")

    run("ooo_conv", StreamingPipeline.conversionStream(_))
    val conv = spark.table("ooo_conv")
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]))).sorted
    assert(conv.toSeq == Seq(
      (101L, Some(103L)), // u1 view converts to the purchase behind it
      (204L, Some(205L)), // u2 view arrived after its purchase, still converts
      (301L, None)),      // u3: watermark-flushed non-conversion, NO sentinel
      s"conversion diverged: ${conv.mkString(", ")}")
  }

  test("streaming SCD2 closed versions == batch q122 closed rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2s").toString
    withSentinel(eventsDf.select("event_id", "ts", "user_id", "event_type", "value"),
        "INTERVAL 1 DAY")
      .write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in").as[Event]
    val q = StreamingPipeline.scd2Stream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
      r.getString(2), r.getTimestamp(3), r.getTimestamp(4), r.getLong(5))
    val streamed = spark.table("scd2_out").filter($"user_id" >= 0)
      .collect().map(key).sortBy(k => (k._1, k._2))
    val batch = EventOps.scd2History(spark, sf0001)
      .filter(!$"is_current") // open versions have no final row yet
      .select("user_id", "version_nr", "tracked_type", "valid_from",
        "valid_to", "n_events")
      .collect().map(key).sortBy(k => (k._1, k._2))
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
  }

  test("streaming SCD2 stays exact when the type change arrives a batch early") {
    // the change event (type B at 00:20) lands a batch BEFORE two more
    // type-A events (00:05, 00:10): naive processing would close A's
    // version at 00:20 with n=1 and then miscount — ordered replay
    // must close A with n=3
    val dir = java.nio.file.Files.createTempDirectory("graft-ooo-scd2").toString
    def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-03-01 00:$m%02d:00")
    def writeBatch(n: Int, rows: Seq[Event]): Unit =
      rows.toDF().coalesce(1).write.parquet(s"$dir/in/b$n")
    writeBatch(1, Seq(Event(1, ts(0), 1, "view", 1.0),
      Event(4, ts(20), 1, "purchase", 1.0)))
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    writeBatch(2, Seq(Event(2, ts(5), 1, "view", 1.0),
      Event(3, ts(10), 1, "view", 1.0)))
    writeBatch(3, Seq(Event(-1, ts(59), 99, "drain", 0.0)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*").as[Event]
    val q = StreamingPipeline.scd2Stream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ooo_scd2")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ooo_scd2").filter($"user_id" === 1L)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getTimestamp(3),
        r.getTimestamp(4), r.getLong(5))).toSeq
    assert(rows == Seq((1L, "view", ts(0), ts(20), 3L)),
      s"SCD2 stream diverged under out-of-order arrival: ${rows.mkString(", ")}")
  }

  test("sessionize stays event-time exact under cross-batch out-of-order arrival") {
    // user 1's 00:10 event arrives a batch BEFORE its 00:00 session
    // opener and the 01:00 next-session opener — the old NoTimeout
    // sessionizer would extend the open session BACKWARD; the ordered
    // harness must yield [00:00–00:10, n=2] then [01:00, n=1], and the
    // final open session must flush off the WATERMARK, no per-user
    // sentinel
    val dir = java.nio.file.Files.createTempDirectory("graft-ooo-sess").toString
    def ts(h: Int, m: Int): Timestamp = Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    // one file per batch — see the anomaly test's writeBatch note
    def writeBatch(n: Int, rows: Seq[Event]): Unit =
      rows.toDF().coalesce(1).write.parquet(s"$dir/in/b$n")
    writeBatch(1, Seq(Event(2, ts(0, 10), 1, "view", 2.0)))
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    writeBatch(2, Seq(
      Event(1, ts(0, 0), 1, "view", 1.0),
      Event(3, ts(1, 0), 1, "view", 4.0)))
    writeBatch(3, Seq(Event(-1, ts(3, 0), 99, "drain", 0.0)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*").as[Event]
    val q = StreamingPipeline.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ooo_sess")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("ooo_sess").filter($"user_id" === 1L)
      .orderBy("session_start")
      .collect().map(r => (r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(sessions == Seq(
      (ts(0, 0), ts(0, 10), 2L, 3.0),  // reassembled in event time
      (ts(1, 0), ts(1, 0), 1L, 4.0)),  // watermark-flushed, no sentinel
      s"sessionize diverged under out-of-order arrival: ${sessions.mkString(", ")}")
  }

  test("demand anomalies stay exact when days arrive out of calendar order") {
    import StreamingPipeline.DailyPoint
    // 14 trailing days of y=10, then day 15 spikes to 100. Day 15
    // arrives a batch BEFORE days 13–14: the old ring would insert it
    // early (mean over 12 days, then 13/14 join after) — the ordered
    // harness must flag exactly the in-order answer
    val dir = java.nio.file.Files.createTempDirectory("graft-ooo-anom").toString
    def d(i: Int): java.sql.Date = java.sql.Date.valueOf(f"2024-01-$i%02d")
    val late = Seq(DailyPoint(5L, d(15), 100.0))
    val early = (1 to 12).map(i => DailyPoint(5L, d(i), 10.0))
    val mid = Seq(DailyPoint(5L, d(13), 10.0), DailyPoint(5L, d(14), 10.0))
    // one file per batch: with maxFilesPerTrigger=1 a multi-file batch
    // could deliver day 15 first and watermark-drop days 1-12 as late
    def writeBatch(n: Int, rows: Seq[DailyPoint]): Unit =
      rows.toDF().select($"entity", $"ds", $"y")
        .coalesce(1).write.parquet(s"$dir/in/b$n")
    writeBatch(1, early ++ late) // day 15 lands two batches early
    writeBatch(2, mid)
    writeBatch(3, Seq(DailyPoint(-1L, d(25), 0.0))) // watermark drain
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*").as[DailyPoint]
    val q = StreamingPipeline.demandAnomalies(stream, delay = "2 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("ooo_anom")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable(); q.stop()
    val flagged = spark.table("ooo_anom").filter($"entity" >= 0)
      .collect().map(r => (r.getDate(1).toString, r.getDouble(2),
        r.getDouble(3), r.getString(5))).toSeq
    // trailing mean over days 1–14 = 10.0 → spike (100 ≥ 30, lift 90)
    assert(flagged == Seq(("2024-01-15", 100.0, 10.0, "spike")),
      s"anomaly twin diverged under out-of-order days: ${flagged.mkString(", ")}")
  }

  test("cohort re-bases on the true first week when it arrives a batch late") {
    // week-2 activity arrives BEFORE the week-1 first touch; the old
    // NoTimeout tracker based the cohort on week 2 and emitted a
    // NEGATIVE offset — watermark ordering must yield cohort week 1
    // with offsets {0, 1}
    val dir = java.nio.file.Files.createTempDirectory("graft-ooo-cohort").toString
    def writeBatch(n: Int, rows: Seq[Event]): Unit =
      rows.toDF().write.parquet(s"$dir/in/b$n")
    writeBatch(1, Seq(Event(2, Timestamp.valueOf("2024-03-12 00:00:00"), 7, "view", 1.0)))
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    writeBatch(2, Seq(Event(1, Timestamp.valueOf("2024-03-05 00:00:00"), 7, "view", 1.0)))
    writeBatch(3, Seq(Event(-1, Timestamp.valueOf("2024-05-01 00:00:00"), 99, "drain", 0.0)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*").as[Event]
    val q = StreamingPipeline.cohortActivity(stream, delay = "15 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("ooo_cohort")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable(); q.stop()
    val facts = spark.table("ooo_cohort").filter($"user_id" === 7L)
      .collect().map(r => (r.getDate(1).toString, r.getInt(2))).sorted
    assert(facts.toSeq == Seq(("2024-03-04", 0), ("2024-03-04", 1)),
      s"cohort re-basing failed: ${facts.mkString(", ")}")
  }
}
