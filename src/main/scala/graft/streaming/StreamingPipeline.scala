package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming twins of the batch event operators
  * (graft.operators.EventOps): identical window/session semantics, so
  * a stream and a batch over the same rows produce the same answers
  * (proved in StreamingSpec via the file source).
  *
  * Design notes for production scale: the windowed agg keys state by
  * (window, event_type) and the watermark bounds state size; the
  * sessionizer keys state by user_id — one state entry per active
  * user, emitted and dropped on gap close. Both survive shuffle
  * repartitioning because state is keyed, not positional.
  */
object StreamingPipeline {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, session_value: Double)

  case class SessionState(start: Long, last: Long, n: Long, totalCents: Long)

  /** Per-event HALF_UP cents — the same value the batch twin's
    * moneySum produces (per-row decimal(·,2) cast, exact long-cents
    * accumulation). Accumulating raw doubles and rounding once at
    * session close diverges from the batch answer whenever individual
    * values carry sub-cent parts. */
  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact

  val GapMicros: Long = 30L * 60 * 1000000

  /** Full-precision conversions — Timestamp.getTime alone is
    * millisecond-truncating; the sub-ms part lives in getNanos. */
  def tsMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** 5-minute tumbling windows per event type with a 10-minute
    * watermark. Works on a streaming OR batch DataFrame (same plan
    * shape as EventOps.eventWindows). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // the SAME money-sum recipe as the batch twin — a hand-rolled
        // variant here would drift if the repo-wide rounding changes
        graft.util.Parity.moneySum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** SLIDING windows on the stream — the q100 batch twin: 10-minute
    * windows every 5 minutes. Structured Streaming keys state by
    * (window, event_type); the slide multiplies live state by
    * window/slide = 2, bounded like the batch Expand, and the
    * watermark still closes windows at the same horizon. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.util.Parity.moneySum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming exact dedup: drop events already seen within the
    * watermark horizon (state = seen keys, bounded by the watermark —
    * the streaming face of the LLM-pipeline dedup family). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** CHAINED stateful operators in one append-mode query — the
    * streaming DAU face of q94: a watermarked (user_id, day) dedup
    * feeds a daily distinct-actives count. The dedup's state is
    * bounded by the 1-day watermark horizon (a user's same-day
    * duplicates all arrive inside it under event-time-ordered
    * replay), the count's by the open day windows, and Spark
    * propagates the watermark THROUGH the dedup so the downstream
    * windows still close exactly — the multi-stateful-operator
    * pipeline shape (dedup → aggregate) a one-operator query can't
    * express. Day windows are epoch-aligned UTC, identical to the
    * batch twin's CAST(ts AS DATE) under the pinned UTC session. */
  def dauStream(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("ts"),
        date_trunc("DAY", col("ts")).as("day"))
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("user_id", "day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("dau"))
      .select(col("w.start").cast(org.apache.spark.sql.types.DateType).as("ds"), col("dau"))

  /** Streaming vector ingest: assign arriving embeddings to a FROZEN
    * k-means centroid set — the online serving face of the q108 index
    * (new vectors route to their cell as they arrive; retraining is a
    * batch concern). The index is bounded metadata (K cells × dim), so
    * it rides into the plan as a LITERAL array of (cell, cv, cnorm2)
    * structs — exactly how a serving system holds a loaded index — and
    * the per-row argmax is one ordered fold over it: STATELESS, no
    * watermark, no shuffle, arbitrarily partitionable. The fold keeps
    * a strictly-greater winner over centroids sorted by cell, which is
    * the batch fit's (csim DESC, cell ASC) max_by tiebreak; the cosine
    * is the composed zip_with fold (the injected optimizer Rule
    * rewrites it to the native DotProduct), so stream and batch
    * assignments are bit-identical. */
  def assignStream(vecs: DataFrame,
      centroids: Seq[(Long, Seq[Double], Double)]): DataFrame = {
    val centArr = array(centroids.sortBy(_._1).map { case (cell, cv, n2) =>
      struct(lit(cell).as("cell"),
        array(cv.map(lit(_)): _*).as("cv"), lit(n2).as("cnorm2"))
    }: _*)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val base = vecs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("norm2", dot(col("e"), col("e")))
    val init = struct(lit(-1L).as("cell"),
      lit(Double.NegativeInfinity).as("csim"))
    val best = aggregate(centArr, init, (acc, c) => {
      val sim = dot(col("e"), c.getField("cv")) /
        (sqrt(col("norm2")) * sqrt(c.getField("cnorm2")))
      when(sim > acc.getField("csim"),
        struct(c.getField("cell").as("cell"), sim.as("csim")))
        .otherwise(acc)
    })
    base.select(col("vec_id"), best.getField("cell").as("cell"),
      best.getField("csim").as("csim"))
  }

  /** Streaming bronze ingest: micro-batches land in the medallion
    * store through the same latest-wins upsert the batch loader uses
    * (S2) — one code path for batch and streaming writes. Returns the
    * started query; caller owns lifecycle. */
  def bronzeIngest(events: DataFrame, store: graft.sources.LayerStore,
    table: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // latest-wins orders by ts: ordering by the key itself would
        // tie every duplicate and pick a nondeterministic winner
        store.upsert("bronze", table, batch.toDF(), Seq("event_id"), "ts")
        ()
      }
      .start()

  /** Streaming CDC consumer: micro-batches of I/U/D change rows land
    * through the same LayerStore.applyCdc the batch consumer uses —
    * one code path, so stream-applied state equals a one-shot batch
    * replay of the full log for ANY assignment of changes to
    * micro-batches, in ANY arrival order: the store keeps each key's
    * (sequence, op) watermark and deletes persist as tombstones, so a
    * stale change arriving late (a file source orders by mtime, not
    * log position) is ignored rather than applied — proven in
    * StreamingSpec by delivering the later log file first. */
  def cdcIngest(changes: DataFrame, store: graft.sources.LayerStore,
    layer: String, table: String, keys: Seq[String], orderCol: String,
    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        store.applyCdc(layer, table, batch.toDF(), keys, orderCol)
        ()
      }
      .start()

  /** Streaming corpus ingest with incremental near-dup dedup — q105's
    * daily-crawl shape as an actual stream: each micro-batch of
    * (doc_id, text) documents shingles FRESH (delta-sized cost),
    * probes the STORED band index of every doc ever seen, verifies
    * LSH candidates with exact Jaccard through the SAME decision core
    * the batch operator uses (TextOps.ingestDecisionOver — one code
    * path, the cdcIngest rule), then appends ACCEPTED docs to the
    * corpus and EVERY doc's bands+shingles to the seen index.
    *
    * Indexing rejected docs too is what makes the final state a pure
    * function of the SET of docs seen, independent of how docs split
    * into micro-batches AND of their arrival order (proven in
    * StreamingCorpusSpec): acceptance is the set predicate "no
    * near-dup with a smaller doc_id exists among everything ever
    * seen", which never depends on whether that other doc was itself
    * accepted — the q105 conservative rule, extended across batches.
    * Under monotone ingest-ordered ids (the common crawl shape) every
    * stored doc has a smaller id than every arrival, so decisions are
    * final at arrival. A LATE batch (ids below the high-watermark —
    * a delayed crawl shard) is handled by RETRACTION: an arriving doc
    * that near-dups an already-ACCEPTED stored doc of larger id wins
    * the id tiebreak the one-shot build would have applied, so the
    * stored doc is retracted — deleted from corpus_docs and
    * corpus_postings, with batch-keyed NEGATIVE correction rows
    * appended to corpus_index_stats and corpus_quality_hist (both are
    * summed by their consumers, so corrections merge by addition) and
    * an audit row in corpus_retractions. Retraction never cascades:
    * the predicate is existence-based, not acceptance-based. The only
    * remaining contract is doc_id UNIQUENESS across the stream
    * (asserted per batch against the decision log).
    *
    * A per-batch decision log lands in `corpus_ingest_log` for audit.
    *
    * Exactly-once across Structured Streaming retries: foreachBatch
    * can re-deliver a batch after a crash, and the four appends here
    * are not atomic together. Each batch therefore commits through a
    * tiny `corpus_ingest_commits` marker table — `intent` row first,
    * `done` row only after every append has landed. A re-delivered
    * batch whose `done` marker exists is skipped whole; one whose
    * `intent` exists without `done` (crash mid-append) first scrubs
    * its own doc_ids from all four tables (delete-by-key rewrite —
    * paid only on the genuine crash-retry path) and re-applies, so a
    * rerun can never double-index the batch or match the batch
    * against its own leftover bands (Jaccard 1.0 self-rejection). */
  def corpusIngest(docs: DataFrame, store: graft.sources.LayerStore,
    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestCorpusBatch(batch.toDF(), store, batchId)
      }
      .start()

  /** q155's A-ES weighted sampler as a STREAM: the race key −ln(u)/w
    * is a stateless pure function of the doc, so "the k smallest keys"
    * is a MERGEABLE sketch — each micro-batch computes its own keys
    * and the stored state collapses to the k smallest of
    * (state ∪ batch). The final table over ANY micro-batch split
    * equals the one-shot batch draw (StreamingCorpusSpec proves
    * one-shot == uneven splits), which is the 100-TB property: a
    * corpus-wide weighted sample stays fresh AT INGEST in a k-row
    * table instead of re-reading everything post-hoc. Unlike
    * corpusIngest, NO commit protocol is needed: the merge is
    * idempotent under batch replay (dropDuplicates on doc_id — a
    * replayed doc re-derives the identical key), so a crash between
    * append and checkpoint just re-merges harmlessly. */
  def sampleIngest(docs: DataFrame, store: graft.sources.LayerStore,
      checkpoint: String, k: Int = graft.operators.TextOps.wSampleK)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sampleBatch(batch.toDF(), store, k)
      }
      .start()

  private val SampleTable = "corpus_sample"

  /** One micro-batch of the streaming sample — also the spec's
    * batch-mode entry. */
  private[graft] def sampleBatch(batchRaw: DataFrame,
      store: graft.sources.LayerStore, k: Int): Unit = {
    if (batchRaw.isEmpty) return
    val cand = graft.operators.TextOps.esKeys(
      batchRaw.select(col("doc_id"), col("source"), col("n_chars")))
    val merged =
      if (store.exists("silver", SampleTable))
        store.table("silver", SampleTable).unionByName(cand)
      else cand
    // k + batch rows at most: dedup (replay safety), keep the k
    // smallest, swap the tiny state table atomically
    val topk = merged.dropDuplicates("doc_id")
      .orderBy(col("es_key"), col("doc_id")).limit(k)
      .persist()
    topk.count()
    store.write("silver", SampleTable, topk)
    topk.unpersist()
    ()
  }

  private val CommitsTable = "corpus_ingest_commits"
  private val RetractionsTable = "corpus_retractions"
  /** Key-list cap for footer-pruned point reads/deletes: above this
    * many driver-held ids (bounded MB of longs) the pruned path stops
    * paying for itself and the full-artifact scan takes over. */
  private val MaxPrunedFetch = 200000
  private val IngestTables = Seq("corpus_docs", "corpus_seen_bands",
    "corpus_seen_shingles", "corpus_ingest_log", "corpus_postings")

  /** The BM25 scorer over the STREAMING-maintained index: the ingest
    * appends each accepted batch's posting rows (corpus_postings) and
    * a per-batch (n_docs, total_dl) stats row (corpus_index_stats) —
    * summing the stats rows gives the exact corpus totals, so a query
    * probes the stored postings with NO corpus re-read and ranks
    * identically to a one-shot index build over the accepted docs
    * (StreamingCorpusSpec proves it): q140's production retrieval
    * shape, kept fresh by the stream. */
  def bm25OverCorpusIndex(store: graft.sources.LayerStore,
      queries: Seq[(String, String)]): DataFrame = {
    val tf = store.table("silver", "corpus_postings")
    val stats = store.table("silver", "corpus_index_stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_dl")).as("total_dl"))
    graft.operators.TextOps.bm25OverIndex(tf, stats, queries)
  }

  /** Freeze the CURRENT q162 quality gate into a stored cutpoint
    * table (`corpus_quality_gate`) that subsequent ingest batches
    * FILTER under — the assignStream/frozen-centroid recipe applied
    * to quality curation: the gate a batch enforces is a pinned
    * artifact, not a moving quantile, so admission is a pure per-doc
    * function and the final corpus stays independent of micro-batch
    * splits and arrival order (proven in StreamingCorpusSpec). The
    * operational loop: ingest → freeze (periodically, e.g. per crawl
    * snapshot) → subsequent batches drop arriving docs whose quality
    * sits below their source's frozen v25, with the verdict logged
    * beside the dedup decision. Sources with no frozen row (first
    * sighting) pass — the gate can't judge a distribution it has
    * never seen. */
  def freezeQualityGate(store: graft.sources.LayerStore): Unit = {
    require(store.exists("silver", "corpus_quality_hist"),
      "freezeQualityGate: no corpus_quality_hist yet — ingest at least one " +
        "batch before freezing a gate (a gate frozen from nothing would " +
        "judge every source it has never seen)")
    store.write("silver", GateTable, qualityGateOverHist(store))
    ()
  }

  private val GateTable = "corpus_quality_gate"
  private val GateScheduleTable = "corpus_gate_schedule"

  /** The automated freeze cadence (round-13 ask #4): the operational
    * loop freezeQualityGate's scaladoc describes ("freeze
    * periodically, e.g. per crawl snapshot"), made executable and
    * SPLIT-INVARIANT. The schedule is expressed in doc-id BLOCKS
    * (block b = ids [b·blockSize, (b+1)·blockSize)), not in batch
    * counts: "every N batches" would tie the gate a doc faces to how
    * the stream happened to micro-batch, while an id-block boundary
    * is a property of the DOC SET — under monotone arrival every doc
    * in block b is gated by the gate frozen from exactly the admitted
    * docs of blocks < b, whatever the batch split (proven in
    * StreamingCorpusSpec with lopsided and per-doc splits).
    *
    * Mechanics: the arriving batch splits at block boundaries and
    * each sub-batch runs through the ordinary commit-protocol ingest
    * under a derived sub-batch id; before a sub-batch whose block
    * exceeds the last frozen block, the gate re-freezes from the
    * streaming histogram. Crash-safety composes from the pieces: the
    * schedule pointer is a stage-swapped 1-row table, a retry
    * re-freezes from the SAME histogram (earlier sub-batches are
    * commit-marked, later ones scrubbed), so the re-frozen gate is
    * bit-identical. Late (non-monotone) arrivals keep every LATER
    * freeze exact — retraction corrections repair the histogram — but
    * an already-frozen gate is a pinned artifact and does not
    * retro-update: the frozen-gate semantic, now on a schedule. */
  def corpusIngestGated(docs: DataFrame, store: graft.sources.LayerStore,
      checkpoint: String, blockSize: Long)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestCorpusBatchGated(batch.toDF(), store, batchId, blockSize)
      }
      .start()

  /** One gated micro-batch — also the batch-mode entry (the spec's
    * twin). Sub-batch ids derive as batchId·4096 + ordinal, so the
    * commit protocol sees a strictly increasing unique id per
    * sub-batch and a crash replay of the outer batch skips exactly
    * the sub-batches whose `done` markers landed. */
  private[graft] def ingestCorpusBatchGated(batchRaw: DataFrame,
      store: graft.sources.LayerStore, batchId: Long, blockSize: Long): Unit = {
    require(blockSize > 0, "blockSize must be positive")
    val s = batchRaw.sparkSession
    import s.implicits._
    val blocks = batchRaw.select(expr(s"doc_id DIV $blockSize").as("b"))
      .distinct().collect().map(_.getLong(0)).sorted
    require(blocks.length < 4096,
      s"batch $batchId spans ${blocks.length} id blocks; raise blockSize")
    def lastFrozen: Long =
      if (store.exists("silver", GateScheduleTable))
        store.table("silver", GateScheduleTable).head().getLong(0)
      else -1L
    // the highest block any DECIDED doc has reached (from the commit
    // markers' max_doc_id — O(commits), no log scan): the gate at
    // boundary b freezes only when crossing INTO a block nothing has
    // reached, because its histogram must be exactly the admitted
    // docs with id < b·blockSize. Without this guard, a block whose
    // docs span two micro-batches would freeze a gate mid-block from
    // a partial histogram and the final corpus would depend on the
    // split.
    def decidedBlock: Long =
      if (store.exists("silver", CommitsTable))
        Option(store.table("silver", CommitsTable)
          .agg(max(col("max_doc_id"))).head().get(0))
          .map(_.asInstanceOf[Long] / blockSize).getOrElse(-1L)
      else -1L
    blocks.zipWithIndex.foreach { case (b, ord) =>
      if (b > lastFrozen && b > decidedBlock &&
          store.exists("silver", "corpus_quality_hist")) {
        // one freeze with the CURRENT histogram covers every crossed
        // boundary at once: boundaries with no docs in between would
        // freeze an identical gate (the histogram didn't change)
        freezeQualityGate(store)
        store.write("silver", GateScheduleTable, Seq(b).toDF("last_frozen_block"))
      }
      ingestCorpusBatch(
        batchRaw.filter(expr(s"doc_id DIV $blockSize") === b),
        store, batchId * 4096L + ord)
    }
  }

  /** The q162 quality gate over the STREAMING-maintained histogram:
    * per-batch partial (source, quality) counts merge by addition
    * into exactly the one-shot corpus histogram (StreamingCorpusSpec
    * proves the gate equal under lopsided splits), so the per-source
    * cutpoints and drop verdicts stay fresh AT INGEST from
    * lattice-bounded stored rows — no corpus re-scan, no re-scoring. */
  def qualityGateOverHist(store: graft.sources.LayerStore): DataFrame =
    graft.operators.TextOps.qualityGateFromHist(
      store.table("silver", "corpus_quality_hist")
        .groupBy(col("source"), col("quality"))
        .agg(sum(col("c")).as("c")))

  /** One micro-batch of the corpus ingest — also the batch-mode entry
    * (the spec's single-shot twin; batch callers supply their own
    * monotonically increasing batchId). Decisions MATERIALIZE before
    * any append mutates the index tables they read; the `done` commit
    * marker is written LAST, so its presence proves the batch applied
    * completely (see corpusIngest for the retry protocol). */
  private[graft] def ingestCorpusBatch(batchRaw: DataFrame,
      store: graft.sources.LayerStore, batchId: Long): Unit = {
    import graft.operators.TextOps
    val batch = batchRaw.select(col("doc_id"), col("text"))
    if (batch.isEmpty) return
    val s = batchRaw.sparkSession
    import s.implicits._
    val commits = if (store.exists("silver", CommitsTable))
      Some(store.table("silver", CommitsTable).persist()) else None
    try {
      def phaseRows(phase: String) = commits.toSeq.flatMap(
        _.filter(col("batch_id") === batchId && col("phase") === phase)
          .collect())
      if (phaseRows("done").nonEmpty) return // replay of an applied batch
      val idRange = batch.agg(max(col("doc_id")), min(col("doc_id"))).head()
      val maxId = idRange.getLong(0)
      val minId = idRange.getLong(1)
      // crash-retry scrub: a prior attempt of THIS batch declared
      // intent but never finished — remove its partial rows so the
      // re-applied appends cannot double-index, and so the decision
      // probe below cannot see the batch's own leftover bands.
      // corpus_retractions is scrubbed ONLY below the `retract`
      // marker: once the marker exists the batch's retraction rows
      // are complete and become the durable source the re-applied
      // corrections/deletions derive from (the retracted docs' text
      // may already be deleted from corpus_docs, so they could not be
      // recomputed) — see the retraction block below.
      if (phaseRows("intent").nonEmpty) {
        // footer-pruned delete: only files whose id range intersects
        // the batch rewrite — O(batch + its files), not O(store)
        val scrubIds = batch.select(col("doc_id")).collect().map(_.getLong(0)).toSeq
        for (t <- IngestTables if store.exists("silver", t))
          store.deleteKeysPruned("silver", t, "doc_id", scrubIds)
        // the stats + quality-histogram tables are batch-keyed, not
        // doc-keyed
        for (t <- Seq("corpus_index_stats", "corpus_quality_hist")
             if store.exists("silver", t))
          store.overwriteKeys("silver", t,
            store.table("silver", t).limit(0), "batch_id", Seq(batchId))
        if (phaseRows("retract").isEmpty && store.exists("silver", RetractionsTable))
          store.overwriteKeys("silver", RetractionsTable,
            store.table("silver", RetractionsTable).limit(0), "batch_id", Seq(batchId))
      }
      // the one remaining arrival contract: doc_ids are unique across
      // the stream (the set predicate is undefined for a re-used id).
      // The decision log holds every id ever decided; the scrub above
      // already removed THIS batch's own crash-retry leftovers.
      // High-watermark fast path: every commit marker (intent AND
      // done — intent covers a crashed batch's partial log rows)
      // carries its batch's max_doc_id, so when this batch's MIN id
      // exceeds the store-wide max — the common monotone-arrival case
      // — no earlier batch can have decided any of these ids and the
      // full log join is skipped. Per-batch probe cost then stays
      // O(commits), not O(total stream length).
      val idWatermark = commits
        .flatMap(c => Option(c.agg(max(col("max_doc_id"))).head().get(0)))
        .map(_.asInstanceOf[Long])
      if (idWatermark.forall(minId <= _) &&
          store.exists("silver", "corpus_ingest_log")) {
        // late-arrival slow path: footer-pruned point read of the log
        // by the batch's ids — O(batch + matching files), not O(log)
        val probeIds = batch.select(col("doc_id")).collect().map(_.getLong(0)).toSeq
        val dup = store.prunedByKeys("silver", "corpus_ingest_log",
          "doc_id", probeIds).limit(1).collect()
        require(dup.isEmpty,
          s"corpus ingest batch $batchId re-uses doc_id ${dup.head.getAs[Long]("doc_id")} " +
            "already decided by an earlier batch; doc_ids must be unique across the stream")
      }
      store.append("silver", CommitsTable,
        Seq((batchId, "intent", maxId)).toDF("batch_id", "phase", "max_doc_id"))
      val bands = TextOps.bandsOver(batch)
      val sh = TextOps.shinglesOverDocs(batch)
      val haveIndex = store.exists("silver", "corpus_seen_bands")
      val oldBands =
        if (haveIndex) store.table("silver", "corpus_seen_bands") else bands.limit(0)
      // localCheckpoint, not persist: the appends below REFRESH their
      // parquet paths (Spark's insert refreshes the path cache), which
      // INVALIDATES any cached plan depending on those paths — merely
      // persisted pairs/decisions would silently recompute against the
      // just-mutated index when the postings/stats jobs re-evaluate
      // them (the batch would then match its own freshly-appended
      // bands: doubled shingle rows, zero Jaccard denominators).
      // Checkpointing truncates the lineage to materialized blocks, so
      // nothing downstream can ever re-read the store. (A
      // multi-executor deployment uses reliable checkpoint() for
      // executor-loss safety.)
      //
      // Two-stage probe, both stages index-size-bounded per batch:
      // (1) the delta's bands BROADCAST against the stored band index
      //     (the index streams through a hash join — one parallel
      //     columnar scan, never shuffled or sorted), candidates
      //     checkpoint delta-bounded;
      // (2) exact-Jaccard verify fetches the candidates' stored
      //     shingle rows through the footer-PRUNED point read — only
      //     files whose id range can hold a candidate are opened, so
      //     the per-batch fetch is O(candidates + matching files)
      //     however large the stored shingle artifact grows (the
      //     steady-state crawl regime SCALING.md's
      //     corpus_ingest_fixed_delta row witnesses). Past
      //     MaxPrunedFetch candidate ids the driver-side key list
      //     stops paying for itself — fall back to the full artifact
      //     scan (the pre-r14 shape).
      val cand = TextOps.ingestCandidates(bands, oldBands,
        broadcastDelta = true).localCheckpoint()
      val matchIds = cand.select(col("match_id")).distinct()
        .limit(MaxPrunedFetch + 1).collect().map(_.getLong(0)).toSeq
      val oldSh =
        if (!haveIndex) sh.limit(0)
        else if (matchIds.length <= MaxPrunedFetch)
          store.prunedByKeys("silver", "corpus_seen_shingles", "doc_id", matchIds)
        else store.table("silver", "corpus_seen_shingles")
      val pairs = TextOps.scoreCandidates(cand,
        oldSh.unionByName(sh)).localCheckpoint()
      val batchSrc = if (batchRaw.columns.contains("source"))
        col("source") else lit("all").as("source")
      // the q162 quality-gate verdict rides BESIDE the dedup decision
      // in one log row per doc: quality is scored for every arriving
      // doc, and when a FROZEN gate exists (freezeQualityGate) the
      // doc's source cutpoint and pass verdict are stamped — admission
      // to the corpus requires accepted AND gate_passed. Without a
      // frozen gate every doc passes (gate_v25 null), so the columns
      // are always present and the log schema never forks.
      val gate = if (store.exists("silver", GateTable))
        store.table("silver", GateTable).select(col("source"), col("v25"))
      else batch.limit(0).select(lit("").as("source"), lit(0.0).as("v25"))
      val dec = TextOps.ingestDecisionFromPairs(batch, pairs)
        .join(TextOps.qualityScoreOver(batch).select(col("doc_id"), col("quality")), "doc_id")
        .join(batchRaw.select(col("doc_id"), batchSrc), "doc_id")
        .join(broadcast(gate.withColumnRenamed("v25", "gate_v25")), Seq("source"), "left")
        .withColumn("gate_passed",
          col("gate_v25").isNull || col("quality") >= col("gate_v25"))
        .select(col("doc_id"), col("n_candidates"), col("best_match_id"),
          col("best_jaccard"), col("accepted"), col("source"), col("quality"),
          col("gate_v25"), col("gate_passed"))
        .localCheckpoint()
      try {
        // ---- retraction (late-batch arrivals only): stored docs that
        // an arriving SMALLER-id near-dup retracts under the set
        // predicate. Monotone arrival yields no match_id > new_id
        // pairs, so this whole block is one cheap filter on the
        // checkpointed pairs in the common case.
        // rids derives from the checkpointed pairs leaf — already
        // immune to the store mutations below, no checkpoint needed
        val rids = TextOps.ingestRetractionsFromPairs(pairs)
        // candidate retraction ids, bounded by the batch's candidate
        // pairs — the key set every store read below prunes on, so a
        // late batch's cost scales with what it retracts, not with
        // the corpus (witnessed by SCALING.md's corpus_retraction row)
        val ridIds = rids.select(col("doc_id"))
          .limit(MaxPrunedFetch + 1).collect().map(_.getLong(0)).toSeq
        val canPrune = ridIds.length <= MaxPrunedFetch
        // corpus_docs can be absent with candidates present (every
        // prior doc rejected) — nothing to retract then
        if (ridIds.nonEmpty && store.exists("silver", "corpus_docs")) {
          // only CURRENTLY-accepted docs retract: rejected-at-arrival
          // docs contributed nothing, already-retracted docs were
          // corrected by their retracting batch (log + retraction
          // rows of other docs are immutable, so this set is stable
          // across crash-retries of this batch)
          val details: DataFrame =
            if (phaseRows("retract").nonEmpty)
              // a prior attempt of THIS batch durably recorded its
              // retractions before any deletion; the retracted docs'
              // text may be gone from corpus_docs by now — reuse
              store.table("silver", RetractionsTable)
                .filter(col("batch_id") === batchId).localCheckpoint()
            else {
              // "currently in the corpus" = dedup-accepted AND past
              // the gate, read as a footer-PRUNED point lookup of the
              // candidate ids (O(candidates + matching files), not
              // O(log)). Pre-gating stores need TWO layers of
              // defense: merged schema (prunedByKeys reads with
              // mergeSchema — a plain read takes ONE file's schema, so
              // on a store mixing old and new files whether
              // gate_passed even appears would be footer-sampling-
              // order dependent), and a per-row
              // coalesce(gate_passed, true) — rows written before
              // gating read NULL, and `NULL && true` is NULL, which a
              // bare filter drops: those docs would silently never be
              // retractable.
              val log = if (canPrune)
                store.prunedByKeys("silver", "corpus_ingest_log", "doc_id", ridIds)
              else store.tableMerged("silver", "corpus_ingest_log")
              val accepted = (if (log.columns.contains("gate_passed"))
                log.filter(col("accepted") &&
                  coalesce(col("gate_passed"), lit(true)))
              else log.filter(col("accepted"))).select(col("doc_id"))
              val prior = if (store.exists("silver", RetractionsTable))
                store.table("silver", RetractionsTable).select(col("doc_id"))
              else rids.select(col("doc_id")).limit(0)
              val toRetract = rids.join(accepted, "doc_id")
                .join(prior, Seq("doc_id"), "left_anti")
              // capture everything the corrections need (source,
              // quality, token count) from corpus_docs BEFORE any
              // deletion, and make it durable FIRST — the `retract`
              // marker then proves the rows are complete. Same
              // pre-upgrade defense as the log read: merged schema
              // (rows written before the source column existed read
              // NULL) and a per-row degrade to 'all' — the sentinel
              // the histogram uses for sourceless batches.
              val docsTbl = if (canPrune)
                store.prunedByKeys("silver", "corpus_docs", "doc_id", ridIds)
              else store.tableMerged("silver", "corpus_docs")
              val docRows = (if (docsTbl.columns.contains("source"))
                docsTbl.withColumn("source",
                  coalesce(col("source"), lit("all")))
              else docsTbl.withColumn("source", lit("all")))
                .join(broadcast(toRetract.select(col("doc_id"))), "doc_id")
              val d = TextOps.qualityScoreOver(docRows)
                .select(col("doc_id"), col("quality"))
                .join(docRows.select(col("doc_id"), col("source"),
                  size(graft.functions.TextFunctions.tokens(col("text")))
                    .cast(org.apache.spark.sql.types.LongType).as("dl")), "doc_id")
                .join(toRetract, "doc_id")
                .select(lit(batchId).as("batch_id"), col("doc_id"),
                  col("retracted_by"), col("jaccard"), col("source"),
                  col("quality"), col("dl"))
                .localCheckpoint()
              store.append("silver", RetractionsTable, d)
              store.append("silver", CommitsTable,
                Seq((batchId, "retract", maxId)).toDF("batch_id", "phase", "max_doc_id"))
              d
            }
          if (details.head(1).nonEmpty) {
            // negative corrections merge by addition into the same
            // sums the consumers fold (batch-keyed: the crash-retry
            // scrub removes and re-derives them)
            store.append("silver", "corpus_index_stats", details
              .agg((-count(lit(1))).as("n_docs"), (-sum(col("dl"))).as("total_dl"))
              .select(lit(batchId).as("batch_id"), col("n_docs"), col("total_dl")))
            store.append("silver", "corpus_quality_hist", details
              .groupBy(col("source"), col("quality"))
              .agg((-count(lit(1))).as("c"))
              .select(lit(batchId).as("batch_id"), col("source"), col("quality"), col("c")))
            // idempotent deletions, LAST: corpus + retrieval index
            // forget the retracted docs — footer-pruned, so only the
            // files holding retracted ids rewrite (O(k + their
            // files), never an O(corpus) table rewrite)
            val delIds = details.select(col("doc_id"))
              .collect().map(_.getLong(0)).toSeq
            for (t <- Seq("corpus_docs", "corpus_postings") if store.exists("silver", t))
              store.deleteKeysPruned("silver", t, "doc_id", delIds)
          }
        }
        store.append("silver", "corpus_ingest_log", dec)
        // admission = dedup-accepted AND past the frozen quality gate;
        // corpus_docs carries the doc's source (degrading to 'all'
        // like the histogram below): retraction corrections need it
        val acceptedIds = broadcast(
          dec.filter(col("accepted") && col("gate_passed")).select(col("doc_id")))
        val acceptedDocs = batchRaw.select(col("doc_id"), col("text"), batchSrc)
          .join(acceptedIds, "doc_id")
        store.append("silver", "corpus_docs", acceptedDocs)
        store.append("silver", "corpus_seen_bands", bands)
        store.append("silver", "corpus_seen_shingles", sh)
        // keep the BM25 retrieval index fresh: accepted docs' posting
        // rows append (delta-sized tokenize, no corpus re-read) plus a
        // per-batch stats row whose running sum is the exact corpus
        // (n_docs, total_dl) the scorer needs
        val post = TextOps.postingsOverDocs(acceptedDocs)
        store.append("silver", "corpus_postings", post)
        val st = acceptedDocs.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(size(graft.functions.TextFunctions.tokens(col("text")))
            .cast(org.apache.spark.sql.types.LongType)), lit(0L)).as("total_dl"))
          .select(lit(batchId).as("batch_id"), col("n_docs"), col("total_dl"))
        store.append("silver", "corpus_index_stats", st)
        // keep the q162 quality histogram fresh: ADMITTED docs'
        // per-(source, quality) partial counts append batch-keyed
        // (histograms merge by ADDITION, so the stored rows sum to
        // exactly the one-shot corpus histogram under any micro-batch
        // split — the same mergeable-state argument as the A-ES
        // sample). Scores and sources ride in the checkpointed
        // decision frame, so this is one group-by over delta rows.
        val hist = dec.filter(col("accepted") && col("gate_passed"))
          .groupBy(col("source"), col("quality")).agg(count(lit(1)).as("c"))
          .select(lit(batchId).as("batch_id"), col("source"), col("quality"), col("c"))
        store.append("silver", "corpus_quality_hist", hist)
        store.append("silver", CommitsTable,
          Seq((batchId, "done", maxId)).toDF("batch_id", "phase", "max_doc_id"))
      } finally { dec.unpersist(); pairs.unpersist(); () }  // drops the checkpoint blocks
    } finally { commits.foreach(_.unpersist()); () }
  }

  /** Stream-stream interval join: each purchase matches the same
    * user's views from the preceding hour. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark can expire join state — the buffered views per user are
    * only those newer than (watermark − 1 hour), never unbounded.
    * Works on streaming AND batch frames (withWatermark is a no-op in
    * batch), so the same function is the batch twin. */
  def purchaseViewJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("p_ts"), col("view_id"), col("v_ts"))
  }

  /** Per-key buffer of a watermark-ordered stateful operator: the
    * rows newer than the watermark (not yet final) plus the
    * operator's own state. */
  case class OrderedBuf[I, S](held: Seq[I], inner: Option[S])

  /** Watermark-ordered stateful execution — the harness that makes a
    * per-key event-order-sensitive state machine EXACT under
    * out-of-order arrival (the late-data caveat the NoTimeout twins
    * used to carry): events buffer per key until the watermark passes
    * them, then replay through `machine` in (event-time, event_id)
    * order. Any event still in flight must carry ts > watermark (the
    * stream drops older rows), so nothing can arrive event-time-
    * earlier than an already-finalized event — stream == batch for
    * every arrival order within the watermark delay, not just
    * monotonic replays.
    *
    * `machine(key, ready, wmUs, state)` consumes the newly-final
    * events (sorted) plus the watermark and returns (new state,
    * outputs, optional next event-time deadline in micros). The
    * deadline lets time-based semantics fire WITHOUT a later event
    * (conversion-window expiry, idle-state retirement) — the
    * EventTimeTimeout wakes the key when the watermark passes the
    * earliest of {held events, deadline}. A key whose machine returns
    * None with nothing held is REMOVED from the store, so idle keys
    * do not accumulate state forever.
    *
    * Scale: state per key = the out-of-order horizon's events plus
    * the machine's own state — bounded by delay × per-key rate, not
    * stream length; keyed state survives shuffle repartitioning. */
  /** Input-generic core of [[watermarkOrdered]]: any row type `I`
    * with a watermarked timestamp column `tsField`, a Long grouping
    * key, and a (event-time micros, tiebreak) total order. The Event
    * overload below keeps the four event twins' call sites unchanged;
    * demandAnomalies runs DailyPoint rows through this directly. */
  private def watermarkOrderedG[
      I <: Product : scala.reflect.runtime.universe.TypeTag,
      S <: Product : scala.reflect.runtime.universe.TypeTag, O](
      rowsDs: Dataset[I], tsField: String, delay: String,
      key: I => Long, evUs: I => Long, tie: I => Long)(
      machine: (Long, Seq[I], Long, Option[S]) => (Option[S], Seq[O], Option[Long]))(
      implicit oEnc: org.apache.spark.sql.Encoder[O]): Dataset[O] = {
    val bufEnc: org.apache.spark.sql.Encoder[OrderedBuf[I, S]] =
      org.apache.spark.sql.Encoders.product[OrderedBuf[I, S]]
    rowsDs.withWatermark(tsField, delay)
      .groupByKey(key)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[OrderedBuf[I, S], O](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: Long, rows: Iterator[I], state: GroupState[OrderedBuf[I, S]]) =>
          val prev = state.getOption.getOrElse(OrderedBuf[I, S](Seq.empty, None))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, held) = (prev.held ++ rows).partition(e => evUs(e) <= wmUs)
          val sorted = ready.sortBy(e => (evUs(e), tie(e)))
          val (inner, out, deadlineUs) = machine(k, sorted, wmUs, prev.inner)
          if (held.isEmpty && inner.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(OrderedBuf(held, inner))
            // wake when the watermark passes the earliest pending work
            (held.map(evUs) ++ deadlineUs).reduceOption(_ min _)
              .foreach(us => state.setTimeoutTimestamp(
                math.max(math.floorDiv(us, 1000L), state.getCurrentWatermarkMs() + 1L)))
          }
          out.iterator
      }(bufEnc, oEnc)
  }

  private def watermarkOrdered[S <: Product : scala.reflect.runtime.universe.TypeTag, O](
      events: Dataset[Event], delay: String)(
      machine: (Long, Seq[Event], Long, Option[S]) => (Option[S], Seq[O], Option[Long]))(
      implicit oEnc: org.apache.spark.sql.Encoder[O]): Dataset[O] =
    watermarkOrderedG[Event, S, O](events, "ts", delay,
      _.user_id, e => tsMicros(e.ts), _.event_id)(machine)

  case class FunnelOut(user_id: Long, stage: Int, stage_name: String,
    reached_ts: Timestamp)
  /** Per-user funnel progress; 0 = stage not reached yet. */
  case class FunnelState(t1: Long, t2: Long, t3: Long)

  /** Stateful ordered-funnel tracker — the streaming twin of the
    * batch q76 funnel (EventOps.funnel): a per-user state machine
    * view → click → purchase with first-touch semantics, emitting a
    * row the first time a user reaches each stage. A stage-N event
    * counts only STRICTLY AFTER the recorded stage-N−1 time, exactly
    * the batch cascade's predicate, so the first qualifying event in
    * ts order IS the batch's min-qualifying event. Runs under
    * [[watermarkOrdered]]: stream == batch EXACTLY for any arrival
    * order within `delay` (StreamingSpec replays a cross-batch
    * out-of-order stream), later events are dropped like every
    * watermarked surface. Inner state is one 3-long struct per user —
    * bounded by the user population, the same cardinality the batch
    * groupBy holds. */
  def funnelStages(events: Dataset[Event], delay: String = "10 minutes"): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    watermarkOrdered[FunnelState, FunnelOut](events, delay) {
      (userId, sorted, _, st0) =>
        var st = st0.getOrElse(FunnelState(0L, 0L, 0L))
        val out = Seq.newBuilder[FunnelOut]
        for (e <- sorted) {
          val t = tsMicros(e.ts)
          e.event_type match {
            case "view" if st.t1 == 0L =>
              st = st.copy(t1 = t); out += FunnelOut(userId, 1, "view", microsTs(t))
            case "click" if st.t1 != 0L && st.t2 == 0L && t > st.t1 =>
              st = st.copy(t2 = t); out += FunnelOut(userId, 2, "click", microsTs(t))
            case "purchase" if st.t2 != 0L && st.t3 == 0L && t > st.t2 =>
              st = st.copy(t3 = t); out += FunnelOut(userId, 3, "purchase", microsTs(t))
            case _ =>
          }
        }
        (Some(st).filter(s => s.t1 != 0L), out.result(), None)
    }
  }

  case class CohortOut(user_id: Long, cohort_week: java.sql.Date, week_offset: Int)
  /** Per-user cohort progress: the cohort week (epoch days of its ISO
    * Monday) plus the week offsets already emitted. */
  case class CohortState(cohortDays: Long, seenOffsets: Seq[Int])

  /** ISO-Monday week start in epoch days — the stateful twin of
    * date_trunc("week", ts) under the UTC session the pipelines pin.
    * Epoch day 0 (1970-01-01) is a Thursday, hence the −4 phase. */
  private def weekStartDays(t: Timestamp): Long = {
    val days = math.floorDiv(t.getTime, 86400000L)
    days - math.floorMod(days - 4L, 7L)
  }

  /** Stateful cohort-activity tracker — the streaming twin of the
    * batch q74 cohort retention (EventOps.cohortRetention): per user,
    * the first active ISO week becomes the cohort, and each newly
    * seen (user, week) emits ONE activity fact (user, cohort_week,
    * week_offset) — the streaming face of q74's dedup-first design
    * (the batch op dedups (user, week) before anything else; here the
    * per-user seen-set IS that dedup). The retention matrix then
    * derives from the emitted facts by plain aggregation: active_users
    * = count per (cohort_week, offset), cohort_size = the offset-0
    * count (every user emits offset 0 first, by construction). State
    * is one long + the offsets seen — bounded by the weeks a user has
    * been active, not event volume. Runs under [[watermarkOrdered]]:
    * the user's event-time-EARLIEST event inside the delay defines
    * the cohort regardless of arrival order — the old NoTimeout
    * version could base the cohort on a later week and emit negative
    * offsets when the true first week arrived late (StreamingSpec
    * replays exactly that reordering). */
  def cohortActivity(events: Dataset[Event], delay: String = "10 minutes"): Dataset[CohortOut] = {
    import events.sparkSession.implicits._
    watermarkOrdered[CohortState, CohortOut](events, delay) {
      (userId, sorted, _, st0) =>
        def dateOf(days: Long): java.sql.Date =
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days))
        var st = st0.orNull
        val out = Seq.newBuilder[CohortOut]
        for (e <- sorted) {
          val w = weekStartDays(e.ts)
          if (st == null) {
            st = CohortState(w, Seq(0))
            out += CohortOut(userId, dateOf(w), 0)
          } else {
            val off = math.floorDiv(w - st.cohortDays, 7L).toInt
            if (!st.seenOffsets.contains(off)) {
              st = st.copy(seenOffsets = st.seenOffsets :+ off)
              out += CohortOut(userId, dateOf(st.cohortDays), off)
            }
          }
        }
        (Option(st), out.result(), None)
    }
  }

  case class DailyPoint(entity: Long, ds: java.sql.Date, y: Double)
  case class AnomalyOut(entity: Long, ds: java.sql.Date, y: Double,
    trailing_mean: Double, lift: Double, direction: String)
  /** Per-entity trailing window: the newest ≤28 daily values (newest
    * last). y is integer-valued (daily sums of integer quantities), so
    * the values are stored and summed as the same longs the batch
    * window folds. */
  case class DemandState(recent: Seq[Long])

  /** The JVM twin of Parity.snapRound: double → DECIMAL(·, scale+4)
    * HALF_UP → round(scale) HALF_UP → double. BigDecimal.valueOf is
    * the shortest-decimal conversion both engines' double→decimal
    * casts use. */
  private def snap(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale + 4, java.math.RoundingMode.HALF_UP)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** DailyPoint plus the watermark column the ordered harness needs
    * (the day midnight as a timestamp). */
  case class DailyPointW(entity: Long, wts: Timestamp, ds: java.sql.Date, y: Double)

  /** Stateful streaming demand-anomaly detector — the twin of the
    * batch q85 (Forecast.demandAnomalies): per entity, each arriving
    * day is compared against the trailing ≤28-day mean of the days
    * seen BEFORE it (at least 14 required), flagged spike/drop under
    * the shared thresholds (Forecast.AnomalyRatio/SpikeMinLift/
    * DropMinBase), then pushed into the ring. Runs under
    * [[watermarkOrderedG]] keyed by entity and ordered by day, so
    * days arriving out of order across micro-batches (a backfilled
    * ingest) still enter the ring in calendar order — stream == batch
    * for any arrival order within the watermark delay, proved
    * including a cross-batch day swap in StreamingSpec. State per
    * entity is the ≤28-long ring plus the days inside the horizon —
    * bounded by the window and the delay, not stream length. */
  def demandAnomalies(points: Dataset[DailyPoint],
      delay: String = "3 days"): Dataset[AnomalyOut] = {
    import points.sparkSession.implicits._
    import graft.operators.Forecast.{AnomalyMinTrailing, AnomalyRatio, AnomalyWindow, DropMinBase, SpikeMinLift}
    val wrapped = points
      .withColumn("wts", col("ds").cast("timestamp"))
      .select(col("entity"), col("wts"), col("ds"), col("y"))
      .as[DailyPointW]
    watermarkOrderedG[DailyPointW, DemandState, AnomalyOut](
      wrapped, "wts", delay, _.entity, p => tsMicros(p.wts), _ => 0L) {
      (entity, ready, _, st0) =>
        var recent = st0.map(_.recent).getOrElse(Seq.empty)
        val out = Seq.newBuilder[AnomalyOut]
        for (p <- ready) {
          if (recent.size >= AnomalyMinTrailing) {
            // long sum / int count — the identical IEEE division the
            // batch window's cast(DoubleType)/count performs
            val mean = snap(recent.sum.toDouble / recent.size, 4)
            val spike = p.y >= mean * AnomalyRatio && p.y - mean >= SpikeMinLift
            val drop = p.y <= mean / AnomalyRatio && mean >= DropMinBase
            if (spike || drop)
              out += AnomalyOut(entity, p.ds, p.y, mean,
                snap(p.y - mean, 4), if (spike) "spike" else "drop")
          }
          recent = (recent :+ p.y.toLong).takeRight(AnomalyWindow)
        }
        // the ring must survive idle gaps to match the batch answer
        // (entity count bounds state, not stream length)
        (Some(DemandState(recent)), out.result(), None)
    }
  }

  case class AttributionOut(event_id: Long, user_id: Long,
    purchase_ts: Timestamp, touches_7d: Long,
    first_touch_type: String, first_touch_ts: Option[Timestamp],
    last_touch_type: String, last_touch_ts: Option[Timestamp])
  /** The touches still inside any future purchase's lookback:
    * (tsMicros, event_id, event_type), ascending by arrival. */
  case class AttrState(touches: Seq[(Long, Long, String)])


  /** Stateful multi-touch attribution — the streaming twin of the
    * batch q89 (EventOps.attribution): per user, buffer the touches
    * (click/view) of the trailing 7 days; each purchase emits its
    * first/last touch inside the lookback (ties at identical
    * timestamps break on event_id, the batch struct-ordering rule)
    * and the touch count, or 'direct' when the window is empty.
    * State per user is the touches inside the lookback HORIZON —
    * bounded by event rate × 7 days — and runs under
    * [[watermarkOrdered]]: purchases and touches finalize in
    * event-time order, so a touch arriving in a later micro-batch
    * than its purchase (but within `delay`) still attributes exactly
    * as the batch q89 would (StreamingSpec replays that reordering).
    * The watermark also PRUNES: touches no future purchase can reach
    * (ts ≤ watermark − 7 d) drop even when the user never purchases
    * again, and a fully-idle user's state is removed — no unbounded
    * key-count growth.
    * Tie caveat: a touch at the purchase's EXACT timestamp with a
    * HIGHER event_id is a batch-RANGE peer (included by q89) but is
    * processed after the purchase here — exact parity assumes unique
    * (user, ts) pairs, which event streams with sub-second clocks
    * give in practice. */
  def attributionStream(events: Dataset[Event], delay: String = "10 minutes"): Dataset[AttributionOut] = {
    import events.sparkSession.implicits._
    // the ONE lookback constant, shared with the batch q89 twin — a
    // second copy here could silently diverge from the batch semantics
    val AttrWindowMicros = graft.operators.EventOps.AttrWindowMicros
    watermarkOrdered[AttrState, AttributionOut](events, delay) {
      (userId, sorted, wmUs, st0) =>
        var touches = st0.map(_.touches).getOrElse(Seq.empty)
        val out = Seq.newBuilder[AttributionOut]
        for (e <- sorted) {
          val t = tsMicros(e.ts)
          touches = touches.dropWhile(_._1 < t - AttrWindowMicros)
          e.event_type match {
            case "click" | "view" =>
              touches = touches :+ ((t, e.event_id, e.event_type))
            case "purchase" =>
              // in-window touches, ordered by (ts, event_id) — the
              // buffer is appended in that order already
              if (touches.isEmpty)
                out += AttributionOut(e.event_id, userId, microsTs(t), 0L,
                  "direct", None, "direct", None)
              else {
                val ft = touches.min
                val lt = touches.max
                out += AttributionOut(e.event_id, userId, microsTs(t),
                  touches.size.toLong,
                  ft._3, Some(microsTs(ft._1)), lt._3, Some(microsTs(lt._1)))
              }
            case _ =>
          }
        }
        // any future purchase has ts > watermark, so its lookback
        // keeps only touches with ts > watermark − window: older ones
        // are dead and drop NOW, not at the user's next event
        touches = touches.dropWhile(_._1 <= wmUs - AttrWindowMicros)
        (Some(AttrState(touches)).filter(_.touches.nonEmpty),
          out.result(),
          touches.headOption.map(_._1 + AttrWindowMicros))
    }
  }

  case class ConversionOut(view_id: Long, user_id: Long, view_ts: Timestamp,
    next_purchase_id: Option[Long], next_purchase_ts: Option[Timestamp],
    latency_micros: Option[Long])
  /** Views still inside their conversion window: (tsMicros, view_id),
    * ascending by arrival. */
  case class ConvState(pending: Seq[(Long, Long)])

  /** Stateful view-to-purchase conversion — the streaming twin of the
    * batch q96 forward as-of with tolerance (EventOps.viewToPurchase):
    * per user, views buffer until the next purchase arrives (every
    * pending view at-or-before it converts to it, with latency) or
    * their 1-hour window lapses as explicit non-conversions (the
    * batch null rows). State per user = the views of the trailing
    * tolerance window, and runs under [[watermarkOrdered]]: events
    * finalize in event-time order (exact under any arrival order
    * within `delay`), and the watermark ITSELF expires windows — a
    * view whose tolerance lapses with no further traffic emits its
    * null row when the watermark passes view_ts + tol, with no
    * sentinel needed, after which the idle user's state is removed.
    * Tie caveat as attributionStream (unique (user, ts) assumed). */
  def conversionStream(events: Dataset[Event], delay: String = "10 minutes"): Dataset[ConversionOut] = {
    import events.sparkSession.implicits._
    val tol = graft.operators.EventOps.ConvTolMicros
    watermarkOrdered[ConvState, ConversionOut](events, delay) {
      (userId, sorted, wmUs, st0) =>
        var pending = st0.map(_.pending).getOrElse(Seq.empty)
        val out = Seq.newBuilder[ConversionOut]
        for (e <- sorted) {
          val t = tsMicros(e.ts)
          // windows that closed strictly before this event: emit the
          // batch twin's null row
          val (expired, live) = pending.partition(v => t - v._1 > tol)
          expired.foreach(v =>
            out += ConversionOut(v._2, userId, microsTs(v._1), None, None, None))
          pending = live
          e.event_type match {
            case "purchase" =>
              // every still-open view at-or-before the purchase
              // converts to it (earliest-at-or-after semantics: this
              // is the first purchase any of them has seen)
              val (conv, stay) = pending.partition(_._1 <= t)
              conv.foreach(v => out += ConversionOut(v._2, userId, microsTs(v._1),
                Some(e.event_id), Some(microsTs(t)), Some(t - v._1)))
              pending = stay
            case "view" =>
              pending = pending :+ ((t, e.event_id))
            case _ =>
          }
        }
        // watermark expiry: any future purchase has ts > watermark, so
        // a view with watermark − view_ts ≥ tol can never convert —
        // its non-conversion is FINAL now (would-have-expired-first)
        val (dead, open) = pending.partition(v => wmUs - v._1 >= tol)
        dead.foreach(v =>
          out += ConversionOut(v._2, userId, microsTs(v._1), None, None, None))
        pending = open
        (Some(ConvState(pending)).filter(_.pending.nonEmpty),
          out.result(),
          pending.headOption.map(_._1 + tol))
    }
  }

  case class Scd2Out(user_id: Long, version_nr: Long, tracked_type: String,
    valid_from: Timestamp, valid_to: Timestamp, n_events: Long)
  case class Scd2State(versionNr: Long, trackedType: String,
    validFromUs: Long, n: Long)

  /** Streaming SCD Type-2 builder — the twin of the batch q122
    * (EventOps.scd2History): per user, consecutive runs of the tracked
    * attribute become version rows, and each version row is emitted
    * THE MOMENT it closes (the successor's first event is its
    * valid_to). Only closed versions emit — the open version's
    * n_events can still grow, so it has no final row until a change
    * closes it; the batch query's is_current rows are the remainder.
    * Runs under [[watermarkOrdered]]: closed versions match the batch
    * answer exactly for any arrival order within the delay (proved in
    * StreamingSpec including a cross-batch type swap). State per user
    * is one 4-field struct. */
  def scd2Stream(events: Dataset[Event], delay: String = "10 minutes"): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    watermarkOrdered[Scd2State, Scd2Out](events, delay) {
      (userId, ready, _, st0) =>
        var st = st0.orNull
        val out = Seq.newBuilder[Scd2Out]
        for (e <- ready) {
          val tsUs = tsMicros(e.ts)
          if (st == null) {
            // version numbering starts at 1: the batch q122's lag-null
            // first row IS DISTINCT FROM its type, so chg sums to 1
            st = Scd2State(1L, e.event_type, tsUs, 1L)
          } else if (st.trackedType != e.event_type) {
            out += Scd2Out(userId, st.versionNr, st.trackedType,
              microsTs(st.validFromUs), microsTs(tsUs), st.n)
            st = Scd2State(st.versionNr + 1, e.event_type, tsUs, 1L)
          } else {
            st = Scd2State(st.versionNr, st.trackedType, st.validFromUs, st.n + 1)
          }
        }
        (Option(st), out.result(), None)
    }
  }

  /** Stateful gap-based sessionization (30-min inactivity). A session
    * closes when a later event lands past the gap — or when the
    * WATERMARK passes start-of-gap + gap, because any still-possible
    * event must carry ts > watermark > last + gap and would close the
    * session anyway: the final open session per user flushes itself,
    * no sentinel event needed, and idle users leave the state store.
    * Runs under [[watermarkOrdered]], so sessions split/merge on
    * event TIME even when arrival order across micro-batches
    * contradicts it — stream == batch for any arrival order within
    * the watermark delay (proved in StreamingSpec). */
  def sessionize(events: Dataset[Event],
      delay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    watermarkOrdered[SessionState, SessionOut](events, delay) {
      (userId, ready, wmUs, st0) =>
        var st = st0.orNull
        val out = Seq.newBuilder[SessionOut]
        for (e <- ready) {
          val tsUs = tsMicros(e.ts)
          if (st == null) {
            st = SessionState(tsUs, tsUs, 1, cents(e.value))
          } else if (tsUs - st.last > GapMicros) {
            out += SessionOut(userId, microsTs(st.start),
              microsTs(st.last), st.n, st.totalCents / 100.0)
            st = SessionState(tsUs, tsUs, 1, cents(e.value))
          } else {
            st = SessionState(st.start, tsUs, st.n + 1, st.totalCents + cents(e.value))
          }
        }
        // watermark-final close: an event that could still extend this
        // session needs ts ≤ last + gap, but any future event has
        // ts ≥ watermark — once wm > last + gap the session is final
        if (st != null && wmUs > st.last + GapMicros) {
          out += SessionOut(userId, microsTs(st.start),
            microsTs(st.last), st.n, st.totalCents / 100.0)
          st = null
        }
        (Option(st), out.result(), Option(st).map(_.last + GapMicros))
    }
  }
}
