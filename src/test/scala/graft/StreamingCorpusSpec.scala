package graft

import graft.streaming.StreamingPipeline

/** The streaming corpus ingest (q105 as a stream): micro-batches
  * dedup against the STORED band index through the same decision core
  * as the batch operator, and the final state is independent of how
  * the docs split into micro-batches (the conservative
  * blocked-by-any-earlier rule indexes rejected docs too). */
class StreamingCorpusSpec extends SparkSpec {
  import spark.implicits._

  // fully per-seed vocabulary: distinct seeds share NO shingles
  private def text(seed: Int): String =
    (0 until 30).map(i => s"t${seed}x$i").mkString(" ")

  // 1, 2, 4 are the originals; 3 duplicates 1, 5 duplicates 2 (both
  // across a batch boundary), 6 duplicates 4 WITHIN its batch
  private val docs = Seq(
    1L -> text(1), 2L -> text(2), 3L -> text(1),
    4L -> text(4), 5L -> text(2), 6L -> text(4))
  private def df(ids: Seq[Long]) =
    docs.filter(d => ids.contains(d._1)).toDF("doc_id", "text")

  private def acceptedOf(store: graft.sources.LayerStore): Seq[Long] =
    store.table("silver", "corpus_docs").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("stream dedups across micro-batches against the stored index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    df(Seq(1L, 2L, 3L)).coalesce(1).write.parquet(s"$dir/in/b1")
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    df(Seq(4L, 5L, 6L)).coalesce(1).write.parquet(s"$dir/in/b2")
    val q = StreamingPipeline.corpusIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/in/*"),
      store, s"$dir/ckpt")
    q.processAllAvailable(); q.stop()
    assert(acceptedOf(store) == Seq(1L, 2L, 4L))
    val log = store.table("silver", "corpus_ingest_log")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("accepted"), Option(r.getAs[java.lang.Long]("best_match_id")))).toMap
    assert(log.size == 6)
    // doc 5's rejection names its STORED witness from the earlier batch
    assert(log(5L)._1 == false && log(5L)._2.contains(2L))
    // doc 6's rejection is the WITHIN-batch rule
    assert(log(6L)._1 == false && log(6L)._2.contains(4L))
    // the seen index holds every doc, accepted or not
    assert(store.table("silver", "corpus_seen_bands")
      .select("doc_id").distinct().count() == 6)
  }

  test("final state is independent of the micro-batch split") {
    def run(splits: Seq[Seq[Long]], tag: String): Seq[Long] = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-corpus-$tag").toString
      val store = new graft.sources.LayerStore(spark, s"$dir/store")
      splits.zipWithIndex.foreach { case (ids, i) =>
        StreamingPipeline.ingestCorpusBatch(df(ids), store, i.toLong) }
      acceptedOf(store)
    }
    val oneShot = run(Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L)), "one")
    val perDoc = run(docs.map(d => Seq(d._1)), "each")
    val lopsided = run(Seq(Seq(1L), Seq(2L, 3L, 4L, 5L), Seq(6L)), "lop")
    assert(oneShot == Seq(1L, 2L, 4L))
    assert(perDoc == oneShot && lopsided == oneShot,
      s"split-dependent state: one=$oneShot each=$perDoc lop=$lopsided")
  }

  test("quality-gate histogram merges to the one-shot q162 gate under any split") {
    import org.apache.spark.sql.functions.col
    // source-bearing corpus: 12 distinct docs of varied length (all
    // accepted, quality varies with token count), plus doc 13 — a
    // cross-batch duplicate of doc 1 that must stay OUT of the gate
    val sdocs = (1 to 12).map { i =>
      (i.toLong, (0 until (5 + i * 3)).map(j => s"s${i}w$j").mkString(" "),
        if (i % 2 == 0) "web" else "code")
    } :+ ((13L, (0 until 8).map(j => s"s1w$j").mkString(" "), "web"))
    def sdf(ids: Seq[Long]) = sdocs.filter(d => ids.contains(d._1))
      .toDF("doc_id", "text", "source")
    def gateRows(splits: Seq[Seq[Long]], tag: String): Seq[String] = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-qhist-$tag").toString
      val store = new graft.sources.LayerStore(spark, s"$dir/store")
      splits.zipWithIndex.foreach { case (ids, i) =>
        StreamingPipeline.ingestCorpusBatch(sdf(ids), store, i.toLong) }
      StreamingPipeline.qualityGateOverHist(store)
        .collect().map(_.toString).sorted.toSeq
    }
    val all = (1L to 13L).map(Seq(_)) // one doc per micro-batch
    val even = gateRows(Seq((1L to 5L), (6L to 9L), (10L to 13L)), "even")
    val perDoc = gateRows(all, "each")
    assert(even == perDoc, s"split-dependent gate: even=$even each=$perDoc")
    // == the batch q162 gate over exactly the ACCEPTED docs' scores
    val acc = sdf((1L to 12L))
    val batchGate = graft.operators.TextOps.qualityGateHistOver(
      graft.operators.TextOps.qualityScoreOver(acc)
        .select(col("doc_id"), col("quality"))
        .join(acc.select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), col("quality")))
      .collect().map(_.toString).sorted.toSeq
    assert(even == batchGate,
      s"stream gate != one-shot batch gate:\n  stream=$even\n  batch=$batchGate")
  }

  test("a re-delivered committed batch is skipped whole") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus-replay").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    StreamingPipeline.ingestCorpusBatch(df(Seq(1L, 2L, 3L)), store, 0L)
    val logBefore = store.table("silver", "corpus_ingest_log").count()
    val bandsBefore = store.table("silver", "corpus_seen_bands").count()
    // foreachBatch retry semantics: same batchId, same rows, again
    StreamingPipeline.ingestCorpusBatch(df(Seq(1L, 2L, 3L)), store, 0L)
    assert(store.table("silver", "corpus_ingest_log").count() == logBefore,
      "replayed batch duplicated the decision log")
    assert(store.table("silver", "corpus_seen_bands").count() == bandsBefore,
      "replayed batch double-indexed its bands")
    assert(acceptedOf(store) == Seq(1L, 2L))
  }

  test("a crash between appends converges on retry instead of self-rejecting") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus-crash").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    StreamingPipeline.ingestCorpusBatch(df(Seq(1L, 2L, 3L)), store, 0L)
    // simulate batch 1 crashing after its index appends but before its
    // done marker: intent row + bands/shingles landed, log/docs did not
    val b2 = df(Seq(4L, 5L))
    store.append("silver", "corpus_ingest_commits",
      Seq((1L, "intent", 5L)).toDF("batch_id", "phase", "max_doc_id"))
    store.append("silver", "corpus_seen_bands",
      graft.operators.TextOps.bandsOver(b2))
    store.append("silver", "corpus_seen_shingles",
      graft.operators.TextOps.shinglesOverDocs(b2))
    // the retry must scrub the leftovers: without the scrub, doc 4's
    // own bands are already in the stored index and the probe matches
    // it against itself at Jaccard 1.0 — the whole batch would reject
    StreamingPipeline.ingestCorpusBatch(b2, store, 1L)
    assert(acceptedOf(store) == Seq(1L, 2L, 4L),
      "retry self-rejected or dropped the batch")
    assert(store.table("silver", "corpus_seen_bands")
      .filter($"doc_id" === 4L).count() ==
      graft.operators.TextOps.bandsOver(df(Seq(4L))).count(),
      "retry double-indexed the crashed batch's bands")
  }

  test("the streaming-maintained BM25 index ranks like a one-shot build over accepted docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus-bm25").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    // batch-wise ingest: dups (3, 5, 6) are rejected, so the index must
    // hold ONLY accepted docs' postings
    Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)).zipWithIndex.foreach { case (ids, i) =>
      StreamingPipeline.ingestCorpusBatch(df(ids), store, i.toLong) }
    val queries = Seq("qa" -> "t1x3 t1x7", "qb" -> "t4x2 t2x9")
    val viaStream = StreamingPipeline.bm25OverCorpusIndex(store, queries)
      .collect().map(_.toSeq).toSeq
    // the one-shot reference: postings + stats built directly over the
    // ACCEPTED corpus, scored through the same bm25OverIndex code path
    val accepted = df(Seq(1L, 2L, 4L))
    val tf = graft.operators.TextOps.postingsOverDocs(accepted)
    import org.apache.spark.sql.functions.{size, split, count, lit, sum}
    val stats = accepted.select(size(split($"text", " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("total_dl"))
    val viaOneShot = graft.operators.TextOps.bm25OverIndex(tf, stats, queries)
      .collect().map(_.toSeq).toSeq
    assert(viaStream.nonEmpty && viaStream == viaOneShot,
      "streaming-maintained index diverged from the one-shot build")
    // rejected docs never entered the index
    assert(store.table("silver", "corpus_postings")
      .filter($"doc_id".isin(3L, 5L, 6L)).count() == 0)
  }

  test("out-of-order doc_id arrival converges to the one-shot build via retraction") {
    import org.apache.spark.sql.functions.col
    def run(splits: Seq[Seq[Long]], tag: String) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-corpus-ooo-$tag").toString
      val store = new graft.sources.LayerStore(spark, s"$dir/store")
      splits.zipWithIndex.foreach { case (ids, i) =>
        StreamingPipeline.ingestCorpusBatch(df(ids), store, i.toLong) }
      (store, acceptedOf(store))
    }
    val (_, oneShot) = run(Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L)), "one")
    // late shard: [4,5,6] lands first, so 5 (dup of the unseen 2) is
    // accepted at arrival and must be RETRACTED when 2 arrives
    val (st1, late) = run(Seq(Seq(4L, 5L, 6L), Seq(1L, 2L, 3L)), "late")
    assert(late == oneShot, s"late shard diverged: late=$late oneShot=$oneShot")
    // fully reversed per-doc arrival: every original arrives after its
    // duplicate — three retractions (6 by 4, 5 by 2, 3 by 1)
    val (st2, rev) = run(docs.map(d => Seq(d._1)).reverse, "rev")
    assert(rev == oneShot, s"reversed arrival diverged: rev=$rev oneShot=$oneShot")
    val retr = st2.table("silver", "corpus_retractions")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("retracted_by")).toMap
    assert(retr == Map(6L -> 4L, 5L -> 2L, 3L -> 1L), s"unexpected retractions: $retr")
    // the retrieval index forgot the retracted doc: postings + summed
    // stats equal a one-shot build over the surviving accepted docs
    assert(st1.table("silver", "corpus_postings")
      .filter(col("doc_id").isin(3L, 5L, 6L)).count() == 0,
      "retracted/rejected docs left postings behind")
    val stSum = st1.table("silver", "corpus_index_stats")
      .agg(org.apache.spark.sql.functions.sum(col("n_docs")),
        org.apache.spark.sql.functions.sum(col("total_dl"))).head()
    assert(stSum.getLong(0) == 3L, s"stats n_docs after retraction: ${stSum.getLong(0)}")
    val queries = Seq("qa" -> "t1x3 t1x7", "qb" -> "t4x2 t2x9")
    val viaStream = StreamingPipeline.bm25OverCorpusIndex(st1, queries)
      .collect().map(_.toSeq).toSeq
    import spark.implicits._
    val accepted = df(Seq(1L, 2L, 4L))
    import org.apache.spark.sql.functions.{size, split, count, lit, sum}
    val tf = graft.operators.TextOps.postingsOverDocs(accepted)
    val stats = accepted.select(size(split($"text", " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("total_dl"))
    val viaOneShot = graft.operators.TextOps.bm25OverIndex(tf, stats, queries)
      .collect().map(_.toSeq).toSeq
    assert(viaStream == viaOneShot,
      "BM25 over the retraction-corrected index diverged from the one-shot build")
  }

  test("retraction keeps the quality gate equal to the one-shot batch gate") {
    import org.apache.spark.sql.functions.col
    // doc 13 (duplicate of doc 1, source web) arrives FIRST: accepted
    // at arrival, retracted when doc 1 lands — the gate must end up
    // exactly the batch gate over docs 1..12
    val sdocs = (1 to 12).map { i =>
      (i.toLong, (0 until (5 + i * 3)).map(j => s"s${i}w$j").mkString(" "),
        if (i % 2 == 0) "web" else "code")
    } :+ ((13L, (0 until 8).map(j => s"s1w$j").mkString(" "), "web"))
    def sdf(ids: Seq[Long]) = sdocs.filter(d => ids.contains(d._1))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft-qhist-ooo").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    Seq(Seq(13L), (7L to 12L), (1L to 6L)).zipWithIndex.foreach { case (ids, i) =>
      StreamingPipeline.ingestCorpusBatch(sdf(ids.toSeq), store, i.toLong) }
    val streamGate = StreamingPipeline.qualityGateOverHist(store)
      .collect().map(_.toString).sorted.toSeq
    val acc = sdf((1L to 12L))
    val batchGate = graft.operators.TextOps.qualityGateHistOver(
      graft.operators.TextOps.qualityScoreOver(acc)
        .select(col("doc_id"), col("quality"))
        .join(acc.select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), col("quality")))
      .collect().map(_.toString).sorted.toSeq
    assert(streamGate == batchGate,
      s"retraction-corrected gate != one-shot gate:\n  stream=$streamGate\n  batch=$batchGate")
  }

  test("a crash mid-retraction converges on retry through the durable retraction rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus-rcrash").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    StreamingPipeline.ingestCorpusBatch(df(Seq(4L, 5L, 6L)), store, 0L)
    // simulate batch 1 ([1,2,3]) crashing AFTER durably recording its
    // retraction of doc 5 and deleting it from corpus_docs, but BEFORE
    // any of its own appends: intent + retract marker + retraction row
    // + the corpus_docs deletion landed, nothing else
    val b1 = df(Seq(1L, 2L, 3L))
    store.append("silver", "corpus_ingest_commits",
      Seq((1L, "intent", 3L)).toDF("batch_id", "phase", "max_doc_id"))
    val five = store.table("silver", "corpus_docs").filter(col("doc_id") === 5L)
    val fiveQ = graft.operators.TextOps.qualityScoreOver(five)
      .select(col("quality")).head().getDouble(0)
    val fiveDl = five.select(
      org.apache.spark.sql.functions.size(
        graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .head().getLong(0)
    store.append("silver", "corpus_retractions",
      Seq((1L, 5L, 2L, 1.0, "all", fiveQ, fiveDl))
        .toDF("batch_id", "doc_id", "retracted_by", "jaccard", "source", "quality", "dl"))
    store.append("silver", "corpus_ingest_commits",
      Seq((1L, "retract", 3L)).toDF("batch_id", "phase", "max_doc_id"))
    store.overwriteMatching("silver", "corpus_docs",
      store.table("silver", "corpus_docs").limit(0), Seq("doc_id"),
      Seq(5L).toDF("doc_id"))
    // the retry: doc 5's text is GONE from corpus_docs, so convergence
    // requires reusing the durable retraction row, not recomputing it
    StreamingPipeline.ingestCorpusBatch(b1, store, 1L)
    assert(acceptedOf(store) == Seq(1L, 2L, 4L), "retry diverged after mid-retraction crash")
    val stSum = store.table("silver", "corpus_index_stats")
      .agg(org.apache.spark.sql.functions.sum(col("n_docs"))).head().getLong(0)
    assert(stSum == 3L, s"stats double-corrected after retry: n_docs=$stSum")
    assert(store.table("silver", "corpus_retractions")
      .filter(col("batch_id") === 1L).count() == 1L,
      "retry duplicated the retraction rows")
  }

  test("frozen quality gate at ingest: reject-below-gate, split- and order-invariant") {
    import org.apache.spark.sql.functions.col
    // seed corpus: 12 distinct docs of varied length (quality varies
    // with token count) establish the per-source histograms
    val seed = (1 to 12).map { i =>
      (i.toLong, (0 until (5 + i * 3)).map(j => s"g${i}w$j").mkString(" "),
        if (i % 2 == 0) "web" else "code")
    }
    // arrivals: per source, one doc far longer than the seed docs
    // (above any v25) and one 2-token stub (below v25)
    val arrivals = Seq(
      (21L, (0 until 50).map(j => s"a21w$j").mkString(" "), "web"),
      (22L, "a22w0 a22w1", "web"),
      (23L, (0 until 50).map(j => s"a23w$j").mkString(" "), "code"),
      (24L, "a24w0 a24w1", "code"))
    def ddf(rows: Seq[(Long, String, String)]) = rows.toDF("doc_id", "text", "source")
    def run(splits: Seq[Seq[Long]], tag: String) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-gate-$tag").toString
      val store = new graft.sources.LayerStore(spark, s"$dir/store")
      StreamingPipeline.ingestCorpusBatch(ddf(seed), store, 0L)
      StreamingPipeline.freezeQualityGate(store)
      splits.zipWithIndex.foreach { case (ids, i) =>
        StreamingPipeline.ingestCorpusBatch(
          ddf(arrivals.filter(a => ids.contains(a._1))), store, i + 1L) }
      (store, acceptedOf(store))
    }
    val (st1, oneShot) = run(Seq(arrivals.map(_._1)), "one")
    // the stubs are gate-dropped, the long docs admitted
    assert(oneShot == ((1L to 12L) ++ Seq(21L, 23L)),
      s"gate admitted the wrong set: $oneShot")
    // verdicts logged beside the dedup decision
    val log = st1.table("silver", "corpus_ingest_log")
      .filter(col("doc_id") >= 21L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("accepted"), r.getAs[Boolean]("gate_passed")))).toMap
    assert(log(22L) == ((true, false)) && log(24L) == ((true, false)),
      s"stubs should be dedup-accepted but gate-dropped: $log")
    assert(log(21L) == ((true, true)) && log(23L) == ((true, true)))
    // gate-dropped docs never reach the retrieval index or histogram
    assert(st1.table("silver", "corpus_postings")
      .filter(col("doc_id").isin(22L, 24L)).count() == 0)
    // split/order invariance under the FROZEN gate: per-doc batches,
    // reversed arrival order, same final corpus
    assert(run(arrivals.map(a => Seq(a._1)), "each")._2 == oneShot)
    assert(run(arrivals.map(a => Seq(a._1)).reverse, "rev")._2 == oneShot)
  }

  test("scheduled gate freezes (id-block cadence) are split-invariant") {
    import org.apache.spark.sql.functions.col
    // blockSize 10: ids 1..8 are block 0 (ungated — nothing frozen
    // before the first block), 11..14 block 1 (gated by the freeze
    // over block 0's admitted docs), 21..24 block 2 (gated by the
    // freeze over blocks 0-1). Per source, each gated block carries
    // one long doc (above any v25) and one 2-token stub (below).
    val all = (1 to 8).map { i =>
      (i.toLong, (0 until (5 + i * 3)).map(j => s"c${i}w$j").mkString(" "),
        if (i % 2 == 0) "web" else "code")
    } ++ Seq(
      (11L, (0 until 50).map(j => s"c11w$j").mkString(" "), "web"),
      (12L, "c12w0 c12w1", "web"),
      (13L, (0 until 50).map(j => s"c13w$j").mkString(" "), "code"),
      (14L, "c14w0 c14w1", "code"),
      (21L, (0 until 60).map(j => s"c21w$j").mkString(" "), "web"),
      (22L, "c22w0 c22w1", "web"),
      (23L, (0 until 60).map(j => s"c23w$j").mkString(" "), "code"),
      (24L, "c24w0 c24w1", "code"))
    def cdf(ids: Seq[Long]) = all.filter(d => ids.contains(d._1))
      .toDF("doc_id", "text", "source")
    def run(splits: Seq[Seq[Long]], tag: String) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-cadence-$tag").toString
      val store = new graft.sources.LayerStore(spark, s"$dir/store")
      splits.zipWithIndex.foreach { case (ids, i) =>
        StreamingPipeline.ingestCorpusBatchGated(cdf(ids), store, i.toLong, 10L) }
      val gate = store.table("silver", "corpus_quality_gate")
        .collect().map(_.toString).sorted.toSeq
      (acceptedOf(store), gate)
    }
    val (oneShot, oneGate) = run(Seq(all.map(_._1)), "one")
    // block 0 ungated; the stubs of blocks 1 and 2 are gate-dropped
    assert(oneShot == ((1L to 8L) ++ Seq(11L, 13L, 21L, 23L)),
      s"cadence admitted the wrong set: $oneShot")
    // lopsided split, per-doc split, and a split that cuts block 1
    // IN HALF mid-block (the case that would freeze a partial-block
    // gate without the decided-block guard) — all identical
    val cases = Seq(
      Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 11L), Seq(12L, 13L, 14L, 21L, 22L, 23L, 24L)),
      all.map(d => Seq(d._1)),
      Seq((1L to 8L) :+ 11L :+ 12L, Seq(13L, 14L), Seq(21L, 22L, 23L, 24L)))
    cases.zipWithIndex.foreach { case (c, i) =>
      val (acc, gate) = run(c, s"s$i")
      assert(acc == oneShot, s"split $i diverged: $acc vs $oneShot")
      assert(gate == oneGate, s"split $i froze a different gate")
    }
  }

  test("a pre-gating store's rows stay retractable after the schema upgrade") {
    import org.apache.spark.sql.functions.col
    // Build the store with the CURRENT code, then rewrite its two
    // evolving tables WITHOUT the post-upgrade columns — exactly the
    // bytes a pre-gating/pre-source version left on disk. The next
    // (late, retracting) batch appends new-schema files beside them:
    // a mixed-footer store. Docs 4,5,6 arrive first; doc 1 (dup of 3
    // = text(1)... use the shared fixture: 3 duplicates 1) — late
    // batch [1] must retract the earlier-accepted 3.
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus-upg").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    StreamingPipeline.ingestCorpusBatch(df(Seq(3L, 4L)), store, 0L)
    // strip the gate columns from the log and source from corpus_docs
    // — the pre-upgrade on-disk shape (old rows will read NULL under
    // the merged schema once new-schema files append beside them)
    store.write("silver", "corpus_ingest_log",
      store.table("silver", "corpus_ingest_log")
        .select(col("doc_id"), col("n_candidates"), col("best_match_id"),
          col("best_jaccard"), col("accepted")))
    store.write("silver", "corpus_docs",
      store.table("silver", "corpus_docs").select(col("doc_id"), col("text")))
    // late batch: doc 1 near-dups stored doc 3 (same text(1) seed)
    // and wins the id tiebreak — 3 must be retracted even though its
    // log row reads gate_passed = NULL under the merged schema
    StreamingPipeline.ingestCorpusBatch(df(Seq(1L)), store, 1L)
    assert(acceptedOf(store) == Seq(1L, 4L),
      s"pre-upgrade row was not retracted: ${acceptedOf(store)}")
    val retr = store.table("silver", "corpus_retractions")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("retracted_by"), r.getAs[String]("source")))
    // the correction degraded the absent source to the 'all' sentinel
    assert(retr.toSeq == Seq((3L, 1L, "all")), s"retractions: ${retr.toSeq}")
    // negative corrections kept the summed stats equal to a one-shot
    // build over the survivors (docs 1 and 4)
    val stSum = store.table("silver", "corpus_index_stats")
      .agg(org.apache.spark.sql.functions.sum(col("n_docs"))).head()
    assert(stSum.getLong(0) == 2L, s"n_docs after upgrade retraction: $stSum")
  }

  test("a re-used doc_id across batches is rejected loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus-dupid").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    StreamingPipeline.ingestCorpusBatch(df(Seq(1L, 2L)), store, 0L)
    val e = intercept[IllegalArgumentException] {
      StreamingPipeline.ingestCorpusBatch(df(Seq(2L, 3L)), store, 1L)
    }
    assert(e.getMessage.contains("re-uses doc_id"))
  }

  // ---- streaming A-ES weighted sample --------------------------------

  private val sampleDocs: Seq[(Long, String, String, String, Long)] =
    (0 until 150).map(i =>
      (i.toLong, "x", "en", "s", if (i % 2 == 0) 100000L else 1L))

  private def sampleState(store: graft.sources.LayerStore): Seq[(Long, Double)] = {
    import org.apache.spark.sql.functions.col
    store.table("silver", "corpus_sample")
      .orderBy(col("es_key"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
  }

  private def runSample(splits: Seq[Seq[Long]]): Seq[(Long, Double)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sample").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    splits.zipWithIndex.foreach { case (ids, i) =>
      sampleDocs.filter(d => ids.contains(d._1))
        .map(d => (d._1, d._4, d._5))
        .toDF("doc_id", "source", "n_chars")
        .coalesce(1).write.parquet(s"$dir/in/b$i")
    }
    val schema = spark.read.parquet(s"$dir/in/b0").schema
    val q = StreamingPipeline.sampleIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/in/*"),
      store, s"$dir/ckpt")
    q.processAllAvailable(); q.stop()
    sampleState(store)
  }

  test("streaming A-ES sample: any split equals the one-shot batch draw") {
    val all = sampleDocs.map(_._1)
    val oneShot = runSample(Seq(all))
    assert(oneShot.length == 100)
    // lopsided micro-batches produce the IDENTICAL k-row state
    assert(runSample(Seq(all.take(7), all.slice(7, 100), all.drop(100))) == oneShot)
    // ...and it equals the q155 batch query over the same docs written
    // as a documents table (stream == batch, exactly)
    val bdir = java.nio.file.Files.createTempDirectory("graft-sample-b").toString
    sampleDocs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$bdir/documents.parquet")
    val batch = graft.operators.TextOps.weightedSample(spark, bdir)
      .collect().map(r => (r.getLong(1), r.getDouble(4))).toSeq
    assert(batch == oneShot)
  }

  test("streaming A-ES sample: batch replay is a no-op (idempotent merge)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sample-r").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    val b = sampleDocs.take(120).map(d => (d._1, d._4, d._5))
      .toDF("doc_id", "source", "n_chars")
    StreamingPipeline.sampleBatch(b, store, 100)
    val once = sampleState(store)
    StreamingPipeline.sampleBatch(b, store, 100) // retry after a crash
    assert(sampleState(store) == once)
  }
}
