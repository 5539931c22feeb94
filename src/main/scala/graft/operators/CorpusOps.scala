package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between dedup and packing (BASELINE.json north star; beyond the
  * reference's own surface):
  *
  *  - q61 repetition profile — the Gopher-style repetition quality
  *    gate: fraction of duplicate word 3-grams plus the most-frequent-
  *    token share, per document (Rae et al. 2021, "Scaling Language
  *    Models", table A1 heuristics).
  *  - q62 decontamination — flag training documents whose word 5-grams
  *    overlap a held-out evaluation source, the standard n-gram
  *    benchmark-contamination check (GPT-3 appendix C methodology).
  *  - q63 vocabulary — corpus-wide token vocabulary with occurrence
  *    and document frequencies, the input of any BPE/WordPiece trainer.
  *
  * Scale design: all three are narrow maps plus hash aggregations.
  * q61's top-token count and q63's vocabulary run as two-level
  * aggregations (token-keyed partial agg, no Expand); q62 joins the
  * (small) eval-set gram list broadcast against the training grams —
  * at 100 TB the eval side is benchmarks (thousands of docs), so the
  * contamination check never shuffles the corpus. All fractions are
  * single IEEE divisions of exact integer counts — correctly rounded,
  * hence bit-identical across engines with no decimal snap needed.
  */
object CorpusOps extends QueryModule {

  /** The held-out benchmark source for q62 (and q116's semantic
    * decontamination — one split rule for both decon passes). */
  private[operators] val EvalSource = "src0"

  // ---- q61: repetition profile -----------------------------------

  /** q61 — per-doc repetition metrics: duplicate-3-gram fraction
    * (1 - distinct/total trigrams) and top-token share. The top-token
    * count is a distributed two-level aggregation, not a per-row
    * quadratic scan: (doc, token) partial counts, then max per doc. */
  def repetitionProfile(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(s, dir, "documents")
    val toks = tokens(col("text"))
    val nTok = size(col("toks"))
    // LongType casts: DuckDB len()/greatest() yield BIGINT. Tokens are
    // projected once, then sized/shingled from the materialized array
    // (TextFunctions.shinglesOf PERF note).
    val base = docs.select(col("doc_id"), toks.as("toks")).select(
      col("doc_id"),
      nTok.cast(LongType).as("n_tokens"),
      greatest(nTok - lit(2), lit(0)).cast(LongType).as("n_grams"),
      size(shinglesOf(col("toks"))).cast(LongType).as("n_distinct_grams"))
    val topTok = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id")).agg(max(col("cnt")).as("top_cnt"))
    base.join(topTok, "doc_id")
      .select(
        col("doc_id"), col("n_tokens"), col("n_grams"),
        when(col("n_grams") > 0,
          lit(1.0) - col("n_distinct_grams").cast(DoubleType) / col("n_grams").cast(DoubleType))
          .otherwise(lit(0.0)).as("dup_gram_frac"),
        (col("top_cnt").cast(DoubleType) / col("n_tokens").cast(DoubleType)).as("top_token_frac"))
      .withColumn("is_repetitive",
        col("dup_gram_frac") > lit(0.2) || col("top_token_frac") > lit(0.3))
      .orderBy(col("doc_id"))
  }

  private val repetitionProfileSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |tc AS (SELECT doc_id, max(cnt) AS top_cnt FROM (
      |    SELECT doc_id, tok, count(1) AS cnt
      |    FROM (SELECT doc_id, unnest(ws) AS tok FROM t) GROUP BY 1, 2)
      |  GROUP BY 1),
      |g AS (SELECT doc_id, len(ws) AS n_tokens,
      |        greatest(len(ws) - 2, 0) AS n_grams,
      |        CASE WHEN len(ws) >= 3 THEN len(list_distinct(
      |          list_transform(generate_series(1, len(ws) - 2),
      |            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
      |        ELSE 0 END AS n_distinct_grams
      |      FROM t)
      |SELECT g.doc_id, n_tokens, n_grams,
      |       CASE WHEN n_grams > 0
      |            THEN 1.0 - CAST(n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
      |            ELSE 0.0 END AS dup_gram_frac,
      |       CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac,
      |       (CASE WHEN n_grams > 0
      |             THEN 1.0 - CAST(n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
      |             ELSE 0.0 END) > 0.2
      |       OR CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.3 AS is_repetitive
      |FROM g JOIN tc ON g.doc_id = tc.doc_id
      |ORDER BY g.doc_id""".stripMargin

  // ---- q110: quality-signal agreement (Spearman) -------------------

  /** q110 — do the corpus's quality signals agree? Spearman rank
    * correlation, per source, between the q26 quality score and the
    * q61 repetition metrics (dup-trigram fraction and top-token
    * share) — the calibration check run before trusting any single
    * signal as a filter gate (a source where quality and repetition
    * rank-agree is being filtered twice; one where they diverge needs
    * both gates). Ranks are total-order row_numbers with a doc_id
    * tiebreak (the q77 portability rule — NOT average-rank ties, and
    * exactly reproducible), so Spearman reduces to the classic
    * 1 − 6·Σd²/(n(n²−1)) over integer rank differences: everything is
    * exact integer/decimal arithmetic until two final IEEE ops,
    * identical cross-engine. Scale: one window shuffle on source
    * (Σd² ≤ n³ needs n < ~2e5 per source for the exact decimal→double
    * step; beyond that, rank from per-source score histograms). */
  def signalAgreement(s: SparkSession, dir: String): DataFrame = {
    import graft.util.Parity.snapRound
    val q = graft.operators.TextOps.qualityScore(s, dir)
      .select(col("doc_id"), col("quality"))
    val rp = repetitionProfile(s, dir)
      .select(col("doc_id"), col("dup_gram_frac"), col("top_token_frac"))
    val src = Tables.t(s, dir, "documents").select(col("doc_id"), col("source"))
    def rk(c: Column) = row_number()
      .over(Window.partitionBy(col("source")).orderBy(c, col("doc_id")))
      .cast(LongType)
    val ranked = q.join(rp, "doc_id").join(src, "doc_id")
      .select(col("source"), rk(col("quality")).as("rq"),
        rk(col("dup_gram_frac")).as("rd"), rk(col("top_token_frac")).as("rt"))
    def d2(a: Column, b: Column) = ((a - b) * (a - b)).cast(DecimalType(38, 0))
    def rho(sd2: Column): Column = {
      val nd = col("n_docs").cast(DoubleType)
      when(col("n_docs") > 1,
        snapRound(lit(1.0) - lit(6.0) * sd2.cast(DoubleType) /
          (nd * (nd * nd - lit(1.0))), 6))
    }
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(d2(col("rq"), col("rd"))).as("sd2_rep"),
        sum(d2(col("rq"), col("rt"))).as("sd2_top"))
      .select(col("source"), col("n_docs"),
        rho(col("sd2_rep")).as("rho_quality_dupgram"),
        rho(col("sd2_top")).as("rho_quality_toptoken"))
      .orderBy(col("source"))
  }

  private val signalAgreementSql = {
    import graft.operators.TextOps.qualityScoreSql
    import graft.util.Parity.snapRoundSql
    def rhoSql(sd2: String) =
      s"""CASE WHEN n_docs > 1 THEN ${snapRoundSql(
        s"1.0 - 6.0 * $sd2 / (CAST(n_docs AS DOUBLE) * " +
          "(CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) - 1.0))", 6)} END"""
    s"""WITH q AS (SELECT doc_id, quality FROM ($qualityScoreSql)),
       |rp AS (SELECT doc_id, dup_gram_frac, top_token_frac FROM ($repetitionProfileSql)),
       |j AS (
       |  SELECT d.source, q.doc_id, q.quality, rp.dup_gram_frac, rp.top_token_frac
       |  FROM q JOIN rp USING (doc_id) JOIN documents d ON q.doc_id = d.doc_id),
       |rk AS (
       |  SELECT source,
       |         row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) AS rq,
       |         row_number() OVER (PARTITION BY source ORDER BY dup_gram_frac, doc_id) AS rd,
       |         row_number() OVER (PARTITION BY source ORDER BY top_token_frac, doc_id) AS rt
       |  FROM j),
       |ag AS (
       |  SELECT source, count(1) AS n_docs,
       |         CAST(sum(CAST((rq - rd) * (rq - rd) AS DECIMAL(38,0))) AS DOUBLE) AS sd2_rep,
       |         CAST(sum(CAST((rq - rt) * (rq - rt) AS DECIMAL(38,0))) AS DOUBLE) AS sd2_top
       |  FROM rk GROUP BY 1)
       |SELECT source, n_docs,
       |       ${rhoSql("sd2_rep")} AS rho_quality_dupgram,
       |       ${rhoSql("sd2_top")} AS rho_quality_toptoken
       |FROM ag ORDER BY source""".stripMargin
  }

  // ---- q62: decontamination --------------------------------------

  /** q62 — n-gram contamination against the held-out eval source:
    * for every training doc (source != eval), the count of its
    * distinct word 5-grams that appear in any eval doc, how many eval
    * docs it hits, and the contaminated-gram fraction. The eval gram
    * list is broadcast — the training corpus never shuffles. */
  /** Session-lifetime verdict artifact: contamination verdicts are a
    * stored per-doc table in a deployment (the curation run writes
    * them once; gates read them), shared here by q62 and q99's funnel
    * stage — one materialization of the gram-overlap join instead of
    * one per consumer. Built eagerly in prep_dedup_decon. */
  private val deconCache =
    new graft.util.Memo[(SparkSession, String), DataFrame](_._1.sparkContext.isStopped)

  def decontaminate(s: SparkSession, dir: String): DataFrame =
    deconCache.getOrBuild((s, dir), {
      // the eval side is benchmarks — small enough to broadcast its
      // gram STRINGS outright
      val d = decontaminateCore(s, dir,
        (tg, evalGrams) => tg.join(broadcast(evalGrams), "g")).persist()
      d.count()
      d
    }).orderBy(col("doc_id"))

  /** q91 — TWO-PHASE decontamination, the large-blocklist scale path
    * of q62: when the contamination side is a prior corpus release
    * rather than a benchmark suite, its gram strings stop fitting in
    * a broadcast. Phase 1 prefilters the training grams against a
    * broadcast of COMPACT 60-bit gram hashes (8 bytes vs ~30-byte
    * 5-gram strings — the dial that keeps a much larger blocklist
    * broadcastable); phase 2 exact-verifies the survivors with a
    * string-equality shuffle join that only moves the hash-HIT grams
    * — the corpus-sized side never shuffles in full. The result is
    * EXACTLY q62 (hash false positives die in the verify join; false
    * negatives cannot exist), so the two plans share one oracle. */
  def decontaminateTwoPhase(s: SparkSession, dir: String): DataFrame =
    decontaminateCore(s, dir, (tg, evalGrams) => {
      def gramHash(g: org.apache.spark.sql.Column) =
        conv(substring(md5(g.cast(BinaryType)), 1, 15), 16, 10).cast(LongType)
      val evalH = evalGrams.select(gramHash(col("g")).as("gh")).distinct()
      tg.join(broadcast(evalH), gramHash(col("g")) === col("gh"), "leftsemi")
        .join(evalGrams, "g")
    })

  // ---- q141: DSIR importance weighting (data selection) -------------

  /** Hashed-feature bucket count for the q141 importance model. 256
    * buckets = exactly the two md5 hex chars featureDim reads — the
    * hash IS the bucket, no modulo bias. */
  private[operators] val DsirDim = 256

  /** q141 — data selection by hashed-n-gram importance weights (DSIR,
    * Xie et al. 2023 "Data Selection for Language Models via
    * Importance Resampling"): estimate target (the held-out eval
    * source, the same split q62/q116 use) and raw unigram-PAIR
    * distributions over a hashed feature space, and score every raw
    * document by the log-likelihood ratio of its features —
    * score(d) = Σ_occurrences ln p̂_target(b) − ln p̂_raw(b) with
    * add-1 smoothing over DsirDim buckets. Positive score = the doc
    * looks more like the target than like the raw pool; `selected`
    * uses that natural threshold (the paper samples ∝ exp(score);
    * the deterministic gate keeps the oracle exact and needs no
    * global sort at any scale).
    *
    * Parity: each ln argument is an exact (count+1)/(total+D)
    * rational of longs — one IEEE division, bit-identical — and the
    * libm ln snaps 6-dp (the q134 rule); bucket weight = difference
    * of two snapped doubles (exact, deterministic); per-doc
    * contributions cnt·w snap 6-dp and fold through DECIMAL(38,10)
    * (order-independent), final score snaps 4-dp.
    *
    * Scale: the weight table is DsirDim rows — broadcast; totals are
    * 1-row scalars (broadcast crossJoin, the allow-listed shape); the
    * corpus makes ONE tokenize+hash pass and one (doc, bucket)
    * aggregation; nothing fact-sized joins and there is no global
    * sort — selection is a per-row predicate. */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    import graft.util.Parity.snapRound
    val docs = Tables.t(s, dir, "documents")
    val toked = docs.select(col("doc_id"), col("source"), tokens(col("text")).as("ts"))
    // raw bigram OCCURRENCES (not the per-doc-distinct shinglesOf):
    // DSIR's feature counts are occurrence counts. ts pre-projected
    // (the shinglesOf PERF rule: lambdas get no CSE).
    val grams = toked.filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), size(col("ts")) - 1),
          i => concat_ws(" ", element_at(col("ts"), i), element_at(col("ts"), i + 1)))).as("g"))
      .select(col("doc_id"), col("source"), featureDim(col("g"), DsirDim).as("b"))
    val tc = grams.filter(col("source") === EvalSource)
      .groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val sc = grams.filter(col("source") =!= EvalSource)
      .groupBy(col("b")).agg(count(lit(1)).as("sc"))
    val tot = tc.agg(coalesce(sum(col("tc")), lit(0L)).as("tt"))
      .crossJoin(sc.agg(coalesce(sum(col("sc")), lit(0L)).as("st")))
    def lnSmoothed(cnt: Column, total: Column): Column =
      snapRound(log((coalesce(cnt, lit(0L)) + lit(1)).cast(DoubleType) /
        (total + lit(DsirDim)).cast(DoubleType)), 6)
    val weights = spark_grid(s)
      .join(broadcast(tc), Seq("b"), "left")
      .join(broadcast(sc), Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        snapRound(lnSmoothed(col("tc"), col("tt")) - lnSmoothed(col("sc"), col("st")), 6).as("w"))
    val perDoc = grams.filter(col("source") =!= EvalSource)
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(weights), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_feats"),
        snapRound(sum(snapRound(col("cnt").cast(DoubleType) * col("w"), 6)
          .cast(DecimalType(38, 10))).cast(DoubleType), 4).as("score"))
    // zero-bigram raw docs still get a row (score 0, unselected):
    // a selection pass must say something about EVERY candidate
    docs.filter(col("source") =!= EvalSource).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score"), lit(0.0)).as("score"))
      .withColumn("selected", col("score") > 0.0)
      .orderBy(col("doc_id"))
  }

  /** The DsirDim-row bucket grid. */
  private def spark_grid(s: SparkSession): DataFrame =
    s.range(DsirDim).select(col("id").cast(IntegerType).as("b"))

  private lazy val dsirWeightsSql = {
    import graft.util.Parity.snapRoundSql
    def lnS(cnt: String, tot: String) =
      snapRoundSql(s"ln(CAST(coalesce($cnt, 0) + 1 AS DOUBLE) / CAST($tot + $DsirDim AS DOUBLE))", 6)
    s"""WITH dtk AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
       |dgr AS (
       |  SELECT doc_id, source,
       |         ${featureDimSql("ts[i] || ' ' || ts[i+1]", DsirDim)} AS b
       |  FROM (SELECT doc_id, source, ts, unnest(generate_series(1, len(ts) - 1)) AS i
       |        FROM dtk WHERE len(ts) >= 2)),
       |dtc AS (SELECT b, count(1) AS tc FROM dgr WHERE source = '$EvalSource' GROUP BY 1),
       |dsc AS (SELECT b, count(1) AS sc FROM dgr WHERE source <> '$EvalSource' GROUP BY 1),
       |dtot AS (SELECT (SELECT coalesce(sum(tc), 0) FROM dtc) AS tt,
       |                (SELECT coalesce(sum(sc), 0) FROM dsc) AS st),
       |dwt AS (
       |  SELECT g.b, ${snapRoundSql(s"(${lnS("tc", "tt")}) - (${lnS("sc", "st")})", 6)} AS w
       |  FROM (SELECT unnest(generate_series(0, ${DsirDim - 1})) AS b) g
       |  LEFT JOIN dtc ON g.b = dtc.b
       |  LEFT JOIN dsc ON g.b = dsc.b, dtot),
       |dpd AS (SELECT doc_id, b, count(1) AS cnt FROM dgr WHERE source <> '$EvalSource' GROUP BY 1, 2),
       |dsco AS (
       |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats,
       |         ${snapRoundSql(
      s"CAST(sum(CAST(${snapRoundSql("CAST(cnt AS DOUBLE) * w", 6)} AS DECIMAL(38,10))) AS DOUBLE)", 4)} AS score
       |  FROM dpd JOIN dwt ON dpd.b = dwt.b GROUP BY 1)
       |SELECT d.doc_id, coalesce(s.n_feats, 0) AS n_feats,
       |       coalesce(s.score, 0.0) AS score,
       |       coalesce(s.score, 0.0) > 0.0 AS selected
       |FROM (SELECT doc_id FROM documents WHERE source <> '$EvalSource') d
       |LEFT JOIN dsco s ON d.doc_id = s.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---- q142: concat-and-chunk sequence packing ----------------------

  /** Context window length (tokens) for the q142 packing plan. */
  private[operators] val PackLen = 128
  /** Prefix-sum group width (docs per group) — the two-level exact
    * prefix sum's fan-out. */
  private[operators] val PackGroup = 1000

  /** q142 — the training-batch packing plan (GPT-style concat-and-
    * chunk): documents concatenate in doc_id order into one token
    * stream cut every PackLen tokens; each doc reports its stream
    * offset, first/last chunk index, chunks spanned, and whether it
    * crosses a chunk boundary (the attention-mask/document-boundary
    * accounting every LLM data loader needs). Pure integer arithmetic
    * end to end — no parity snap anywhere.
    *
    * Scale: the global offset is an exact TWO-LEVEL prefix sum, not a
    * single-partition window — docs cumsum within doc_id-range groups
    * (shuffle keyed on the group), group totals (corpus/PackGroup
    * rows) cumsum in one tiny frame, and each doc adds its group's
    * offset via a broadcast join. At 100 TB the group frame is the
    * only sequential structure and it is millions of times smaller
    * than the corpus (add a third level if it ever isn't — the
    * standard scan-prefix recursion). */
  def packChunks(s: SparkSession, dir: String): DataFrame =
    packChunksOver(
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), size(tokens(col("text"))).cast(LongType).as("n_toks")),
      PackGroup)

  /** The packing core over any (doc_id, n_toks) frame — the seam the
    * spec uses to prove the two-level prefix sum equals a naive
    * single-pass cumsum at a tiny group width (so the groups really
    * compose, not just degenerate to one). */
  private[graft] def packChunksOver(docTokens: DataFrame, groupWidth: Int): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = docTokens
      .withColumn("grp", floor(col("doc_id") / groupWidth).cast(LongType))
      .withColumn("in_grp", coalesce(sum(col("n_toks")).over(w), lit(0L)))
    val wg = Window.orderBy(col("grp")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("grp")).agg(sum(col("n_toks")).as("g_total"))
      .withColumn("g_off", coalesce(sum(col("g_total")).over(wg), lit(0L)))
      .select(col("grp"), col("g_off"))
    base.join(broadcast(offsets), "grp")
      .withColumn("offset", col("g_off") + col("in_grp"))
      .withColumn("first_chunk",
        when(col("n_toks") > 0, floor(col("offset") / PackLen).cast(LongType)))
      .withColumn("last_chunk",
        when(col("n_toks") > 0,
          floor((col("offset") + col("n_toks") - 1) / PackLen).cast(LongType)))
      .select(col("doc_id"), col("n_toks"), col("offset"),
        col("first_chunk"), col("last_chunk"),
        when(col("n_toks") > 0, col("last_chunk") - col("first_chunk") + 1)
          .otherwise(lit(0L)).as("chunks_spanned"),
        when(col("n_toks") > 0, col("last_chunk") =!= col("first_chunk"))
          .otherwise(lit(false)).as("crosses_boundary"))
      .orderBy(col("doc_id"))
  }

  /** The q142 offset/chunk arithmetic over any CTE providing
    * (doc_id, n_toks) — ONE SQL definition shared by q142 and the
    * q146 manifest, mirroring the packChunksOver seam. */
  private def packSqlOver(src: String): String =
    s"""pko AS (
       |  SELECT doc_id, n_toks,
       |         CAST(coalesce(sum(n_toks) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
       |  FROM $src)
       |SELECT doc_id, n_toks, "offset",
       |       CASE WHEN n_toks > 0 THEN CAST(floor("offset" / $PackLen) AS BIGINT) END AS first_chunk,
       |       CASE WHEN n_toks > 0 THEN CAST(floor(("offset" + n_toks - 1) / $PackLen) AS BIGINT) END AS last_chunk,
       |       CASE WHEN n_toks > 0
       |         THEN CAST(floor(("offset" + n_toks - 1) / $PackLen) AS BIGINT)
       |            - CAST(floor("offset" / $PackLen) AS BIGINT) + 1
       |         ELSE 0 END AS chunks_spanned,
       |       CASE WHEN n_toks > 0
       |         THEN CAST(floor(("offset" + n_toks - 1) / $PackLen) AS BIGINT)
       |            <> CAST(floor("offset" / $PackLen) AS BIGINT)
       |         ELSE false END AS crosses_boundary
       |FROM pko ORDER BY doc_id""".stripMargin

  private lazy val packChunksSql =
    s"""WITH pk AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
       |  FROM documents),
       |${packSqlOver("pk")}""".stripMargin

  // ---- q143: trained quality classifier (logistic regression) -------

  /** Hashed-feature width of the q143 classifier — 64 buckets keeps
    * the model broadcast-tiny; production raises it like any
    * hashing-trick dimension (the weight table stays O(dims), never
    * corpus-sized). */
  private[operators] val LrDim = 64
  /** Full-batch GD epochs — unrolled identically in both engines. */
  private[operators] val LrEpochs = 3

  /** q143 — trained quality classifier (the GPT-3 data-selection
    * recipe, Brown et al. 2020 appendix A: a linear classifier scores
    * every raw document by similarity to a trusted target corpus):
    * logistic regression over hashed unigram term-frequency features,
    * trained by LrEpochs full-batch gradient-descent passes with the
    * eval source as the positive class, then every raw doc scored by
    * its margin w·x. DSIR (q141) is the importance-RESAMPLING quality
    * selector; this is the trained-CLASSIFIER selector — the two
    * canonical filter families, side by side on the same split.
    *
    * Parity: feature x = cnt/n_toks is one IEEE division snapped 6dp;
    * every dot/gradient reduction snaps its terms 6dp and folds
    * through DECIMAL(38,10) (order-independent under partial
    * aggregation); the sigmoid's exp is the one libm call and its
    * output snaps 6dp (the q134 ln rule); weights snap 6dp per epoch —
    * both engines iterate over IDENTICAL fixed-point states, so the
    * unrolled recursions cannot drift.
    *
    * Scale: the model lives on the driver between epochs — O(LrDim)
    * rows per collect, the Spark-MLlib iteration contract (JoinAdvisor
    * precedent for O(K) driver reads) — and re-enters each epoch as a
    * broadcast join, so plan depth stays CONSTANT in epochs instead of
    * doubling (the naive lazy recursion re-expands w_{k-1} twice per
    * epoch). The feature frame persists across the LrEpochs passes and
    * unpersists once the final weights are collected; each epoch is
    * one doc-keyed margin aggregation plus one bucket-keyed gradient
    * aggregation with map-side partial sums — distributed full-batch
    * GD, no global sort anywhere. */
  def lrQuality(s: SparkSession, dir: String): DataFrame =
    lrQualityOver(s, Tables.t(s, dir, "documents"))

  /** Feature plan: (doc_id, y, b, cnt, x) — one tokenize+hash pass. */
  private def lrFeats(docs: DataFrame): DataFrame = {
    import graft.util.Parity.snapRound
    docs
      .select(col("doc_id"),
        when(col("source") === EvalSource, lit(1.0)).otherwise(lit(0.0)).as("y"),
        tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("y"),
        size(col("ts")).cast(LongType).as("n_toks"), explode(col("ts")).as("tok"))
      .groupBy(col("doc_id"), col("y"), col("n_toks"),
        featureDim(col("tok"), LrDim).as("b"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("y"), col("b"), col("cnt"),
        snapRound(col("cnt").cast(DoubleType) / col("n_toks").cast(DoubleType), 6).as("x"))
  }

  /** The classifier core over any documents-shaped frame (the seam the
    * spec uses to plant a separable corpus and watch the margin find
    * it). */
  private[graft] def lrQualityOver(s: SparkSession, docs: DataFrame): DataFrame = {
    import graft.util.Parity.snapRound
    // eager localCheckpoint, not persist (the q166/q90/q131 lineage
    // rule): the epoch loop re-enters this frame 2× per epoch and the
    // scoring pass once more — checkpointed, each re-entry sees a
    // LogicalRDD leaf AND the scoring pass can reuse the materialized
    // rows directly instead of re-deriving features from the raw frame
    val feats = lrFeats(docs).localCheckpoint()
    val nDocs = docs.select(col("doc_id")).count()
    // snapped-decimal dot product of a doc's features with the joined
    // broadcast weights — shared by training margins and final scoring
    def margin(scale: Int): Column =
      snapRound(sum(snapRound(col("x") * col("w"), 6)
        .cast(DecimalType(38, 10))).cast(DoubleType), scale)
    def weightsDf(w: Seq[(Int, Double)]): DataFrame =
      s.createDataFrame(w).toDF("b", "w")
    // the driver-side twin of snapRound/snapRoundSql: decimal(·,10)
    // then HALF_UP to 6 — the same two-stage snap, or the engines'
    // fixed-point states would diverge from the driver's
    def snap6(x: Double): Double =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var weights: Seq[(Int, Double)] = (0 until LrDim).map(b => (b, 0.0))
    for (_ <- 1 to LrEpochs) {
      val errs = feats.join(broadcast(weightsDf(weights)), "b")
        .groupBy(col("doc_id"), col("y"))
        .agg(margin(6).as("z"))
        .select(col("doc_id"),
          (snapRound(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6) - col("y")).as("err"))
      // errs is doc-count-sized — broadcast it so the gradient pass is
      // a map over the checkpointed features, not a per-epoch shuffle
      // of the feature rows (guide §3.1, the q166 rule)
      val grads = feats.join(broadcast(errs), "doc_id")
        .groupBy(col("b"))
        .agg(snapRound(sum(snapRound(col("x") * col("err"), 6)
          .cast(DecimalType(38, 10))).cast(DoubleType) / lit(nDocs.toDouble), 6).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      // lr = 1 exactly: the update is one IEEE subtraction of snapped
      // 6-dp values (deterministic), then the two-stage re-snap
      weights = weights.map { case (b, w) =>
        (b, snap6(w - grads.getOrElse(b, 0.0)))
      }
    }
    // score over the SAME checkpointed feature frame (the q166 rule):
    // re-deriving lrFeats paid the tokenize+explode+hash pass — the
    // dominant stage — a second time. The checkpoint is a LogicalRDD
    // leaf, so the returned plan holds rows, not the training lineage.
    feats.filter(col("y") === 0.0)
      .join(broadcast(weightsDf(weights)), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_feats"), margin(4).as("score"))
      .withColumn("selected", col("score") > 0.0)
      .orderBy(col("doc_id"))
  }

  private lazy val lrQualitySql = {
    import graft.util.Parity.snapRoundSql
    def dot(wcte: String, scale: Int) = snapRoundSql(
      s"CAST(sum(CAST(${snapRoundSql("f.x * w.w", 6)} AS DECIMAL(38,10))) AS DOUBLE)", scale)
    val epochs = (1 to LrEpochs).map { k =>
      s"""lz$k AS (
         |  SELECT f.doc_id, f.y, ${dot(s"lw${k - 1}", 6)} AS z
         |  FROM lfx f JOIN lw${k - 1} w ON f.b = w.b GROUP BY 1, 2),
         |le$k AS (
         |  SELECT doc_id, ${snapRoundSql("1.0 / (1.0 + exp(-z))", 6)} - y AS err FROM lz$k),
         |lg$k AS (
         |  SELECT f.b, ${snapRoundSql(
        s"CAST(sum(CAST(${snapRoundSql("f.x * e.err", 6)} AS DECIMAL(38,10))) AS DOUBLE)" +
          " / CAST(n AS DOUBLE)", 6)} AS g
         |  FROM lfx f JOIN le$k e USING (doc_id), lnd GROUP BY f.b, n),
         |lw$k AS (
         |  SELECT w.b, ${snapRoundSql("w.w - coalesce(g.g, 0.0)", 6)} AS w
         |  FROM lw${k - 1} w LEFT JOIN lg$k g ON w.b = g.b)""".stripMargin
    }.mkString(",\n")
    s"""WITH ltk AS (
       |  SELECT doc_id,
       |         CASE WHEN source = '$EvalSource' THEN 1.0 ELSE 0.0 END AS y,
       |         string_split(text, ' ') AS ts
       |  FROM documents),
       |lfx AS (
       |  SELECT doc_id, y, b, count(1) AS cnt,
       |         ${snapRoundSql("CAST(count(1) AS DOUBLE) / CAST(n_toks AS DOUBLE)", 6)} AS x
       |  FROM (SELECT doc_id, y, CAST(len(ts) AS BIGINT) AS n_toks,
       |               ${featureDimSql("tok", LrDim)} AS b
       |        FROM (SELECT doc_id, y, ts, unnest(ts) AS tok FROM ltk))
       |  GROUP BY doc_id, y, n_toks, b),
       |lnd AS (SELECT count(1) AS n FROM documents),
       |lw0 AS (SELECT unnest(generate_series(0, ${LrDim - 1})) AS b, 0.0 AS w),
       |$epochs
       |SELECT doc_id, n_feats, score, score > 0.0 AS selected FROM (
       |  SELECT f.doc_id, CAST(sum(f.cnt) AS BIGINT) AS n_feats,
       |         ${dot(s"lw$LrEpochs", 4)} AS score
       |  FROM lfx f JOIN lw$LrEpochs w ON f.b = w.b
       |  WHERE f.y = 0.0 GROUP BY f.doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q145: data-constrained mixing plan ---------------------------

  /** Token budget as a multiple of the measured corpus mass — the
    * "train for 2× the unique data" regime where repetition planning
    * starts to matter. Run configuration at scale. */
  private val BudgetMult = 2L
  /** Repetition half-life R* ≈ 4 epochs (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models": repeated tokens decay
    * in value with R*≈4). */
  private val RStar = 4.0

  /** q145 — the data-constrained mixing plan: given a token budget
    * (BudgetMult × the measured corpus) split uniformly across the
    * measured sources, report per source how many EPOCHS of its unique
    * tokens the target demands and the EFFECTIVE token value of that
    * repetition under the Muennighoff et al. 2023 diminishing-returns
    * curve, eff = U·R*·(1 − e^(−R/R*)) — linear in R for R ≪ R*,
    * saturating at R*·U. `data_constrained` flags sources whose target
    * exceeds their unique mass (R > 1) — the table a data lead reads
    * to decide which sources need MORE COLLECTION vs more epochs.
    * q68/q106 decide what to sample; this decides whether the recipe
    * is even fundable from the data on hand.
    *
    * Parity: targets are exact integer arithmetic (BudgetMult·T div
    * n_sources); epochs is one IEEE division snapped 6dp; the exp is
    * the one libm call, snapped 6dp (q134 rule); the outer product
    * snaps 2dp. Scale: one per-source aggregation (map-side combine),
    * a 1-row total broadcast back onto the sources-sized frame —
    * the corpus is touched once, nothing fact-sized shuffles. */
  def dataBudgetPlan(s: SparkSession, dir: String): DataFrame = {
    import graft.util.Parity.snapRound
    val st = Tables.t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast(LongType)).as("u_tokens"))
    val tot = st.agg(sum(col("u_tokens")).cast(LongType).as("t"),
      count(lit(1)).as("ns"))
    st.crossJoin(broadcast(tot))
      .withColumn("target_tokens", expr(s"($BudgetMult * t) div ns"))
      .withColumn("epochs", snapRound(
        col("target_tokens").cast(DoubleType) / col("u_tokens").cast(DoubleType), 6))
      .withColumn("eff_tokens", snapRound(
        col("u_tokens").cast(DoubleType) * lit(RStar) *
          (lit(1.0) - snapRound(exp(-col("epochs") / lit(RStar)), 6)), 2))
      .withColumn("data_constrained", col("epochs") > 1.0)
      .select(col("source"), col("n_docs"), col("u_tokens"), col("target_tokens"),
        col("epochs"), col("eff_tokens"), col("data_constrained"))
      .orderBy(col("source"))
  }

  private lazy val dataBudgetPlanSql = {
    import graft.util.Parity.snapRoundSql
    val epochs = snapRoundSql(
      "CAST(target_tokens AS DOUBLE) / CAST(u_tokens AS DOUBLE)", 6)
    s"""WITH bst AS (
       |  SELECT source, count(1) AS n_docs,
       |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS u_tokens
       |  FROM documents GROUP BY 1),
       |btot AS (SELECT CAST(sum(u_tokens) AS BIGINT) AS t, count(1) AS ns FROM bst),
       |btgt AS (
       |  SELECT source, n_docs, u_tokens,
       |         ($BudgetMult * t) // ns AS target_tokens
       |  FROM bst, btot),
       |bep AS (
       |  SELECT source, n_docs, u_tokens, target_tokens, $epochs AS epochs
       |  FROM btgt)
       |SELECT source, n_docs, u_tokens, target_tokens, epochs,
       |       ${snapRoundSql(
        s"CAST(u_tokens AS DOUBLE) * $RStar * (1.0 - ${snapRoundSql(s"exp(-epochs / $RStar)", 6)})", 2)} AS eff_tokens,
       |       epochs > 1.0 AS data_constrained
       |FROM bep
       |ORDER BY source""".stripMargin
  }

  // ---- q99: end-to-end curation funnel -----------------------------

  /** q99 — the WHOLE curation pipeline as one declarative plan, with
    * the survivor funnel a curation run reports: input → quality gate
    * (q26 score ≥ 50) → exact dedup among survivors (min doc_id per
    * text hash) → near-dup canonicals only (q54's connected-component
    * clusters) → decontaminated (q62 verdict). Each stage filters the
    * previous stage's survivors; output is the 5-row
    * (stage, survivors, dropped) funnel. This is the composition
    * story: every stage is the already-oracle-verified operator, and
    * the expensive stages READ the stored stage artifacts (the q54
    * cluster assignments and q62 verdicts a curation run writes once
    * — prep_dedup_decon builds them; first touch builds lazily
    * elsewhere), so the funnel itself costs the quality gate, the
    * exact-dedup window, and id-keyed joins of per-doc flag frames. */
  /** The wide per-doc curation flag frame — the q99 funnel's input,
    * shared with the q146 manifest so both read ONE definition of
    * "survivor" (and one build of the stored stage artifacts). */
  private def curationFlags(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"), md5(col("text").cast(BinaryType)).as("th"))
    val passQ = TextOps.qualityScore(s, dir)
      .select(col("doc_id"), (col("quality") >= 50.0).as("pass_q"))
    val exactKeep = col("pass_q") &&
      col("doc_id") === min(when(col("pass_q"), col("doc_id")))
        .over(Window.partitionBy(col("th")))
    docs.join(passQ, "doc_id")
      .withColumn("exact_keep", exactKeep)
      .join(TextOps.dedupClusters(s, dir).select(col("doc_id"), col("is_canonical")), Seq("doc_id"))
      .join(decontaminate(s, dir).select(col("doc_id"), col("is_contaminated")),
        Seq("doc_id"), "left") // eval-source docs have no q62 row — not subject
  }

  def curationFunnel(s: SparkSession, dir: String): DataFrame = {
    // one wide per-doc flag frame, then ONE aggregation produces every
    // stage count — per-stage count() aggregates would re-execute each
    // prior stage's whole subtree once per stage (measured 6.0 s vs
    // ~2 s for this shape at sf0.1)
    val flags = curationFlags(s, dir)
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    val keep4 = col("exact_keep") && col("is_canonical")
    val keep5 = keep4 && !coalesce(col("is_contaminated"), lit(false))
    val one = flags.agg(
      count(lit(1)).as("c1"), cnt(col("pass_q")).as("c2"), cnt(col("exact_keep")).as("c3"),
      cnt(keep4).as("c4"), cnt(keep5).as("c5"))
    val names = Seq("input", "quality_gate", "exact_dedup",
      "near_dedup_canonical", "decontaminated")
    one.select(explode(array(names.zipWithIndex.map { case (n, i) =>
        struct(lit(i + 1).as("stage_idx"), lit(n).as("stage"),
          col(s"c${i + 1}").as("survivors"),
          (if (i == 0) lit(0L) else col(s"c$i") - col(s"c${i + 1}")).as("dropped"))
      }: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.survivors"), col("r.dropped"))
      .orderBy(col("stage_idx"))
  }

  /** The survivor CTE chain (s2 quality → s3 exact dedup → s4
    * canonical → s5 decontaminated) — q99's stages, shared VERBATIM
    * with the q146 manifest so both engines hold one definition of a
    * curation survivor. */
  private lazy val survivorCtes =
    s"""s2 AS (SELECT doc_id FROM (${TextOps.qualityScoreSql}) WHERE quality >= 50.0),
      |s3 AS (SELECT min(doc_id) AS doc_id FROM (
      |         SELECT d.doc_id, md5(d.text) AS th FROM documents d JOIN s2 USING (doc_id))
      |       GROUP BY th),
      |s4 AS (SELECT s3.doc_id FROM s3 JOIN (${TextOps.dedupClustersSql}) cl
      |         ON s3.doc_id = cl.doc_id WHERE cl.is_canonical),
      |s5 AS (SELECT s4.doc_id FROM s4 LEFT JOIN
      |         (SELECT doc_id FROM ($decontaminateSql) WHERE is_contaminated) dc
      |         ON s4.doc_id = dc.doc_id WHERE dc.doc_id IS NULL)""".stripMargin

  private def curationFunnelSql =
    s"""WITH $survivorCtes,
      |counts AS (
      |  SELECT 1 AS stage_idx, 'input' AS stage, (SELECT count(1) FROM documents) AS survivors
      |  UNION ALL SELECT 2, 'quality_gate', (SELECT count(1) FROM s2)
      |  UNION ALL SELECT 3, 'exact_dedup', (SELECT count(1) FROM s3)
      |  UNION ALL SELECT 4, 'near_dedup_canonical', (SELECT count(1) FROM s4)
      |  UNION ALL SELECT 5, 'decontaminated', (SELECT count(1) FROM s5))
      |SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage, survivors,
      |       coalesce(lag(survivors) OVER (ORDER BY stage_idx) - survivors, 0) AS dropped
      |FROM counts ORDER BY stage_idx""".stripMargin

  // ---- q151: UniMax water-filling language allocation ----------------

  /** Per-language epoch cap (UniMax's N). The token budget reuses
    * q145's BudgetMult (one budget definition for both planners);
    * BudgetMult < EMaxEpochs guarantees the budget binds
    * (Σ alloc = B exactly). */
  private val EMaxEpochs = 4L
  // the comment above is now ENFORCED (r11 advice): if BudgetMult ever
  // reached EMaxEpochs the water-level validity filter would match no
  // candidate and q151 would silently return an empty frame — fail the
  // class-load loudly instead
  require(BudgetMult < EMaxEpochs,
    s"q151 needs BudgetMult ($BudgetMult) < EMaxEpochs ($EMaxEpochs): " +
      "otherwise the budget cannot bind and no water-level breakpoint exists")

  /** q151 — UniMax language allocation (Chung et al. 2023): spend a
    * token budget B = BudgetMult·ΣU as UNIFORMLY across languages as
    * the per-language epoch cap (EMaxEpochs·U_l) allows — the
    * water-filling dual of q106's temperature sampling (temperature
    * tilts proportions; UniMax equalizes them subject to caps, which
    * the paper shows dominates tuned temperatures at scale). The water
    * level θ solves Σ_l min(cap_l, θ) = B in closed form: with caps
    * sorted ascending and S_i their prefix sums, θ = (B − S_i)/(n − i)
    * for the unique i where θ lands in [c_i, c_{i+1}) — one rank
    * window + prefix sum + validity filter over LANGUAGE-cardinality
    * rows (the global window is over n_langs rows, never the corpus;
    * the corpus contributes one (lang) aggregation). Capped languages
    * (c_l ≤ θ) get all their epochs; the rest get θ each. Parity:
    * U/cap/S/B are exact longs; θ is ONE IEEE division of exact
    * integers (correctly rounded, bit-identical both engines), so the
    * validity comparisons and the capped/uncapped split agree
    * everywhere; outputs snap 4/6-dp. */
  def unimaxAlloc(s: SparkSession, dir: String): DataFrame =
    unimaxAllocOver(s, Tables.t(s, dir, "documents"))

  /** The allocator over any documents-shaped frame (the seam the spec
    * uses to plant skewed language masses and check Σ alloc = B and
    * the cap/level split against a hand water-fill). */
  private[graft] def unimaxAllocOver(s: SparkSession, docs: DataFrame): DataFrame = {
    import graft.util.Parity.snapRound
    val caps = docs
      .select(col("lang"), size(tokens(col("text"))).cast(LongType).as("n_toks"))
      .groupBy(col("lang")).agg(sum(col("n_toks")).as("u"))
      .withColumn("cap", col("u") * lit(EMaxEpochs))
    val totals = caps.agg(count(lit(1)).as("n"),
      (sum(col("u")) * lit(BudgetMult)).as("b"))
    // ranked caps + prefix sums: n_langs rows, so the global window is
    // deliberate (q75 rank precedent), not a corpus-sized sort
    val wRank = Window.orderBy(col("cap"), col("lang"))
    val ranked = caps
      .withColumn("i", row_number().over(wRank).cast(LongType))
      .withColumn("s", sum(col("cap")).over(
        wRank.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("i"), col("cap"), col("s"))
    // the i=0 candidate (no language capped): θ = B/n
    val cand = ranked
      .unionByName(totals.select(lit(0L).as("i"), lit(0L).as("cap"), lit(0L).as("s")))
      .crossJoin(broadcast(totals))
      .withColumn("next_cap", lead(col("cap"), 1).over(Window.orderBy(col("i"))))
      .withColumn("theta", when(col("i") < col("n"),
        (col("b") - col("s")).cast(DoubleType) / (col("n") - col("i")).cast(DoubleType)))
    val pick = cand
      .filter(col("theta").isNotNull &&
        col("theta") >= col("cap").cast(DoubleType) &&
        (col("next_cap").isNull || col("theta") < col("next_cap").cast(DoubleType)))
      .orderBy(col("i")).limit(1)
      .select(col("theta"))
    caps.crossJoin(broadcast(pick))
      .withColumn("alloc_raw", when(col("cap").cast(DoubleType) <= col("theta"),
        col("cap").cast(DoubleType)).otherwise(col("theta")))
      .select(col("lang"), col("u").as("corpus_tokens"), col("cap").as("cap_tokens"),
        (col("cap").cast(DoubleType) <= col("theta")).as("is_capped"),
        snapRound(col("alloc_raw"), 4).as("alloc_tokens"),
        snapRound(col("alloc_raw") / col("u").cast(DoubleType), 6).as("epochs"),
        snapRound(col("theta"), 4).as("water_level"))
      .orderBy(col("lang"))
  }

  private lazy val unimaxAllocSql = {
    import graft.util.Parity.snapRoundSql
    s"""WITH uut AS (
       |  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS u
       |  FROM documents GROUP BY 1),
       |ucp AS (SELECT lang, u, u * $EMaxEpochs AS cap FROM uut),
       |utot AS (SELECT count(1) AS n, CAST(sum(u) AS BIGINT) * $BudgetMult AS b FROM ucp),
       |urk AS (
       |  SELECT CAST(row_number() OVER (ORDER BY cap, lang) AS BIGINT) AS i, cap,
       |         CAST(sum(cap) OVER (ORDER BY cap, lang
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
       |  FROM ucp),
       |uc0 AS (SELECT i, cap, s FROM urk UNION ALL SELECT 0, 0, 0),
       |ucand AS (
       |  SELECT c.i, c.cap, t.n, t.b,
       |         lead(c.cap) OVER (ORDER BY c.i) AS next_cap,
       |         CASE WHEN c.i < t.n
       |           THEN CAST(t.b - c.s AS DOUBLE) / CAST(t.n - c.i AS DOUBLE) END AS theta
       |  FROM uc0 c, utot t),
       |upick AS (
       |  SELECT theta FROM ucand
       |  WHERE theta IS NOT NULL AND theta >= CAST(cap AS DOUBLE)
       |    AND (next_cap IS NULL OR theta < CAST(next_cap AS DOUBLE))
       |  ORDER BY i LIMIT 1),
       |ual AS (
       |  SELECT c.lang, c.u, c.cap, p.theta,
       |         CASE WHEN CAST(c.cap AS DOUBLE) <= p.theta
       |           THEN CAST(c.cap AS DOUBLE) ELSE p.theta END AS alloc_raw
       |  FROM ucp c, upick p)
       |SELECT lang, u AS corpus_tokens, cap AS cap_tokens,
       |       CAST(cap AS DOUBLE) <= theta AS is_capped,
       |       ${snapRoundSql("alloc_raw", 4)} AS alloc_tokens,
       |       ${snapRoundSql("alloc_raw / CAST(u AS DOUBLE)", 6)} AS epochs,
       |       ${snapRoundSql("theta", 4)} AS water_level
       |FROM ual ORDER BY lang""".stripMargin
  }

  // ---- q146: the shipping training manifest --------------------------

  /** q146 — the training MANIFEST: the one table a training job
    * actually reads. Composes the whole pipeline end to end — q99's
    * curation survivors (quality gate → exact dedup → near-dup
    * canonical → decontaminated) ∩ q144's leakage-safe TRAIN split,
    * eval-source docs excluded (they are the benchmark, never
    * training data) — then lays the survivors out with q142's
    * concat-and-chunk stream offsets. Every stage is an already
    * oracle-verified operator; this query proves they COMPOSE: both
    * engines share the stage definitions verbatim (curationFlags /
    * survivorCtes, splitAssign, packChunksOver / packSqlOver), so a
    * drift in any stage breaks this hash too.
    *
    * Scale: survivor flags and the split are id-keyed joins of
    * per-doc frames over stored stage artifacts (the q99/q144 cost
    * model); the packing is the q142 two-level prefix sum. Nothing
    * here adds a shuffle the component queries didn't already have. */
  def trainingManifest(s: SparkSession, dir: String): DataFrame = {
    val keep = col("exact_keep") && col("is_canonical") &&
      !coalesce(col("is_contaminated"), lit(false)) &&
      col("source") =!= EvalSource
    val kept = curationFlags(s, dir).filter(keep).select(col("doc_id"))
    val train = TextOps.splitAssign(s, dir)
      .filter(col("split") === "train").select(col("doc_id"))
    val docTokens = Tables.t(s, dir, "documents")
      .join(kept, "doc_id").join(train, "doc_id")
      .select(col("doc_id"), size(tokens(col("text"))).cast(LongType).as("n_toks"))
    packChunksOver(docTokens, PackGroup)
  }

  private lazy val trainingManifestSql =
    s"""WITH $survivorCtes,
       |mtr AS (SELECT doc_id FROM (${TextOps.splitAssignSql}) WHERE "split" = 'train'),
       |mtk AS (
       |  SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks
       |  FROM documents d
       |  JOIN s5 ON d.doc_id = s5.doc_id
       |  JOIN mtr ON d.doc_id = mtr.doc_id
       |  WHERE d.source <> '$EvalSource'),
       |${packSqlOver("mtk")}""".stripMargin

  /** The shared decontamination shape: build eval + training gram
    * frames, delegate the match to `hitsOf(tg, evalGrams)` (the
    * broadcast-vs-two-phase seam), aggregate per training doc. */
  private def decontaminateCore(s: SparkSession, dir: String,
      hitsOf: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val docs = Tables.t(s, dir, "documents")
    // tokens in their own projection: the gram lambda reads a
    // materialized array instead of re-splitting the text per
    // element_at (TextFunctions.shinglesOf PERF note)
    val evalGrams = docs.filter(col("source") === EvalSource)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(explode(shinglesOf(col("toks"), 5)).as("g"), col("doc_id").as("eval_doc"))
    // ONE shingling pass over the training corpus: the gram list and
    // its size come from the same projection, explode_outer keeps
    // zero-gram docs (their null gram can never match the eval join)
    val tg = docs.filter(col("source") =!= EvalSource)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shinglesOf(col("toks"), 5).as("grams"))
      .select(col("doc_id"), size(col("grams")).cast(LongType).as("n_grams"),
        explode_outer(col("grams")).as("g"))
    // two single-distinct aggregates joined back, not two
    // countDistincts in one agg: the multi-distinct form plans an
    // Expand that doubles the matched-gram rows through the shuffle;
    // separately each is a map-side-partial distinct over its own
    // 2-column projection of the (bounded) match set
    val hits = hitsOf(tg, evalGrams)
    val overlap = hits.select(col("doc_id"), col("g")).distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("overlap_grams"))
    val evalDocs = hits.select(col("doc_id"), col("eval_doc")).distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("matched_eval_docs"))
    val matched = overlap.join(evalDocs, Seq("doc_id"))
    tg.groupBy(col("doc_id")).agg(max(col("n_grams")).as("n_grams"))
      .join(matched, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_grams"),
        coalesce(col("overlap_grams"), lit(0L)).as("overlap_grams"),
        coalesce(col("matched_eval_docs"), lit(0L)).as("matched_eval_docs"))
      .withColumn("contamination_frac",
        when(col("n_grams") > 0,
          col("overlap_grams").cast(DoubleType) / col("n_grams").cast(DoubleType))
          .otherwise(lit(0.0)))
      .withColumn("is_contaminated", col("contamination_frac") >= lit(0.5))
      .orderBy(col("doc_id"))
  }

  private val decontaminateSql =
    s"""WITH g5 AS (
      |  SELECT doc_id, source, CASE WHEN len(string_split(text,' ')) >= 5
      |    THEN list_distinct(list_transform(generate_series(1, len(string_split(text,' ')) - 4),
      |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
      |           string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3] || ' ' ||
      |           string_split(text,' ')[i+4]))
      |    ELSE [] END AS grams
      |  FROM documents),
      |ev AS (SELECT unnest(grams) AS g, doc_id AS eval_doc FROM g5 WHERE source = '$EvalSource'),
      |tr AS (SELECT doc_id, unnest(grams) AS g FROM g5 WHERE source <> '$EvalSource'),
      |m AS (SELECT tr.doc_id, count(DISTINCT tr.g) AS overlap_grams,
      |             count(DISTINCT ev.eval_doc) AS matched_eval_docs
      |      FROM tr JOIN ev ON tr.g = ev.g GROUP BY 1)
      |SELECT t.doc_id, len(t.grams) AS n_grams,
      |       coalesce(m.overlap_grams, 0) AS overlap_grams,
      |       coalesce(m.matched_eval_docs, 0) AS matched_eval_docs,
      |       CASE WHEN len(t.grams) > 0
      |            THEN CAST(coalesce(m.overlap_grams, 0) AS DOUBLE) / CAST(len(t.grams) AS DOUBLE)
      |            ELSE 0.0 END AS contamination_frac,
      |       (CASE WHEN len(t.grams) > 0
      |             THEN CAST(coalesce(m.overlap_grams, 0) AS DOUBLE) / CAST(len(t.grams) AS DOUBLE)
      |             ELSE 0.0 END) >= 0.5 AS is_contaminated
      |FROM g5 t LEFT JOIN m ON t.doc_id = m.doc_id
      |WHERE t.source <> '$EvalSource'
      |ORDER BY t.doc_id""".stripMargin

  // ---- q152: contamination span excision -----------------------------

  /** Gram width shared with q62 (one contamination definition). */
  private val SpanN = 5

  /** q152 — span-level contamination EXCISION, the action q62's
    * doc-level flag approximates: every occurrence of an eval 5-gram
    * in a training doc marks the token interval [i, i+5); overlapping
    * and adjacent-hit intervals COALESCE (the classic interval-merge:
    * consecutive matched grams overlap by 4 tokens, so a contiguous
    * quoted benchmark passage of any length merges into ONE span) and
    * the doc reports matched/merged span counts, excised and kept
    * token mass, and the excision fraction — the surgical alternative
    * to dropping a 99%-clean doc for one quoted question (the
    * span-removal decontamination GPT-3 appendix C describes). The
    * interval merge is windowed per doc: running max of span end over
    * the start-ordered hits, a new merged span starts where start >
    * every previous end — one window pass, no self-join, span count
    * bounded by the doc's gram count. Scale: the eval gram set
    * broadcasts (benchmarks are thousands of docs); hits are
    * match-sized; the merge windows partition BY DOC so the corpus
    * never single-partitions. All integer arithmetic; the one IEEE
    * division is the output fraction. */
  def spanExcision(s: SparkSession, dir: String): DataFrame =
    spanExcisionStages(s, dir)("full")

  /** Stage frames for tools.ExcisionProfile (and the full query). */
  private[graft] def spanExcisionStages(
      s: SparkSession, dir: String): Map[String, DataFrame] = {
    val docs = Tables.t(s, dir, "documents")
    val evalG = docs.filter(col("source") === EvalSource)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(explode(shinglesOf(col("toks"), SpanN)).as("g")).distinct()
    // ordered, NON-distinct grams with their 1-based token start:
    // explode TOKENS (cheap Generate) and assemble each gram from four
    // lead() columns over the per-doc position window. A transform()
    // gram ARRAY in its own Project feeding posexplode measured 12×
    // slower (11 s at sf0.1) — not the lambda itself, but
    // InferFiltersFromGenerate pushing size(arr) > 0 / isnotnull(arr)
    // into the scan filter with the whole transform re-inlined, every
    // element_at re-splitting the text (see shinglesOverDocs /
    // tools.ShingleProfile). The lead chain sidesteps the trap and
    // shares its doc_id partitioning with the interval-merge window
    val trToks = docs.filter(col("source") =!= EvalSource)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val tr = trToks.select(col("doc_id"),
      size(col("toks")).cast(LongType).as("n_tokens"))
    val wTok = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    def lead4(k: Int): Column = lead(col("tok"), k).over(wTok)
    val grams = trToks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p", "tok")))
      .withColumn("g", concat_ws(" ", col("tok") +: (1 until SpanN).map(lead4): _*))
      .withColumn("last_tok", lead4(SpanN - 1))
      .filter(col("last_tok").isNotNull) // positions with a full gram only
      .select(col("doc_id"), col("p"), col("g"))
    val hits = grams
      .join(broadcast(evalG), "g")
      .select(col("doc_id"), (col("p") + lit(1L)).as("st"),
        (col("p") + lit(1L + SpanN)).as("en")) // [st, en) in 1-based tokens
    val wSpan = Window.partitionBy(col("doc_id")).orderBy(col("st"), col("en"))
    val merged = hits
      .withColumn("prev_max_en",
        max(col("en")).over(wSpan.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        when(col("prev_max_en").isNull || col("st") > col("prev_max_en"), 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("new_span")).over(
        wSpan.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("st")).as("mst"), max(col("en")).as("men"))
    val perDoc = merged.groupBy(col("doc_id"))
      .agg(sum(col("n_hits")).as("n_matched_spans"),
        count(lit(1)).as("n_merged_spans"),
        sum(col("men") - col("mst")).as("excised_tokens"))
    val full = tr.select(col("doc_id"), col("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_matched_spans"), lit(0L)).as("n_matched_spans"),
        coalesce(col("n_merged_spans"), lit(0L)).as("n_merged_spans"),
        coalesce(col("excised_tokens"), lit(0L)).as("excised_tokens"))
      .withColumn("kept_tokens", col("n_tokens") - col("excised_tokens"))
      .withColumn("excision_frac",
        when(col("n_tokens") > 0,
          col("excised_tokens").cast(DoubleType) / col("n_tokens").cast(DoubleType))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
    Map("evalG" -> evalG, "grams" -> grams, "hits" -> hits,
      "merged" -> merged, "full" -> full)
  }

  private val spanExcisionSql =
    s"""WITH xg AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS ts
       |  FROM documents),
       |xe AS (
       |  SELECT DISTINCT unnest(CASE WHEN len(ts) >= $SpanN
       |    THEN list_transform(generate_series(1, len(ts) - ${SpanN - 1}),
       |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4])
       |    ELSE [] END) AS g
       |  FROM xg WHERE source = '$EvalSource'),
       |xt AS (
       |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens, ts
       |  FROM xg WHERE source <> '$EvalSource'),
       |xp AS (
       |  SELECT doc_id,
       |         unnest(CASE WHEN len(ts) >= $SpanN
       |           THEN generate_series(1, len(ts) - ${SpanN - 1}) ELSE [] END) AS st,
       |         unnest(CASE WHEN len(ts) >= $SpanN
       |           THEN list_transform(generate_series(1, len(ts) - ${SpanN - 1}),
       |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4])
       |           ELSE [] END) AS g
       |  FROM xt),
       |xh AS (
       |  SELECT p.doc_id, CAST(p.st AS BIGINT) AS st,
       |         CAST(p.st + $SpanN AS BIGINT) AS en
       |  FROM xp p JOIN xe e ON p.g = e.g),
       |xm AS (
       |  SELECT doc_id, st, en,
       |         CASE WHEN max(en) OVER (PARTITION BY doc_id ORDER BY st, en
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |              OR st > max(en) OVER (PARTITION BY doc_id ORDER BY st, en
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |              THEN 1 ELSE 0 END AS new_span
       |  FROM xh),
       |xs AS (
       |  SELECT doc_id, st, en,
       |         CAST(sum(new_span) OVER (PARTITION BY doc_id ORDER BY st, en
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS span_id
       |  FROM xm),
       |xsp AS (
       |  SELECT doc_id, span_id, count(1) AS n_hits,
       |         min(st) AS mst, max(en) AS men
       |  FROM xs GROUP BY 1, 2),
       |xpd AS (
       |  SELECT doc_id, CAST(sum(n_hits) AS BIGINT) AS n_matched_spans,
       |         count(1) AS n_merged_spans,
       |         CAST(sum(men - mst) AS BIGINT) AS excised_tokens
       |  FROM xsp GROUP BY 1)
       |SELECT t.doc_id, t.n_tokens,
       |       coalesce(p.n_matched_spans, 0) AS n_matched_spans,
       |       coalesce(p.n_merged_spans, 0) AS n_merged_spans,
       |       coalesce(p.excised_tokens, 0) AS excised_tokens,
       |       t.n_tokens - coalesce(p.excised_tokens, 0) AS kept_tokens,
       |       CASE WHEN t.n_tokens > 0
       |            THEN CAST(coalesce(p.excised_tokens, 0) AS DOUBLE) / CAST(t.n_tokens AS DOUBLE)
       |            ELSE 0.0 END AS excision_frac
       |FROM xt t LEFT JOIN xpd p ON t.doc_id = p.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // ---- q158: C4 line-level cleaning ----------------------------------

  /** Tokens per rendered "line" — the fixture's line renderer: the
    * synthetic corpus carries no newlines, so lines are fixed
    * LineWidth-token windows (the q72 chunking rule at line grain;
    * the same fixture stand-in precedent as the Sheets ingest). */
  private val LineWidth = 10L
  /** C4's "at least 5 words" line gate (Raffel et al. 2020 §2.2). */
  private val MinLineWords = 5L
  /** C4's "at least 3 sentences" page gate, at line grain. */
  private val MinDocLines = 3L
  /** C4 keeps only lines ending in terminal punctuation. The corpus
    * has no punctuation, so these frequent "noun-like" tokens stand in
    * as sentence enders — the RULE (judge the line by its final
    * token) is C4's; only the alphabet is the fixture's. */
  private[graft] val LineTerminals =
    Seq("data", "row", "table", "line", "batch", "stream", "query", "value")
  /** C4's blocklist/boilerplate line removal ("javascript", lorem
    * ipsum, policy lines). The real entries ride along verbatim;
    * "dup" is the corpus token that makes the rule observable. */
  private[graft] val LineBlocklist = Seq("dup", "javascript", "lorem", "ipsum")

  /** q158 — C4's LINE-level cleaning pass (Raffel et al. 2020 §2.2),
    * the line-granularity complement of q152's span excision: each
    * line drops if it contains a blocklisted token, has fewer than
    * MinLineWords words, or does not end in a terminal marker (rules
    * applied in that priority so every dropped line has exactly ONE
    * recorded reason); a doc survives when ≥ MinDocLines lines remain
    * (C4's three-sentence page rule). Emits per-doc kept/dropped line
    * counts by reason plus token accounting — the audit frame a
    * curation run keeps. Parity: all integer counts from exact
    * aggregations; the line's final token is max_by over unique
    * positions (total order, no tie). Scale: the q152 shape — one
    * posexplode of tokens, one (doc, line) aggregation, one doc
    * rollup; everything shuffles on doc_id, no window, no join. */
  def lineClean(s: SparkSession, dir: String): DataFrame =
    lineCleanOver(Tables.t(s, dir, "documents"))

  /** The pass over any documents-shaped frame (the spec's seam for
    * planted blocklist/short/terminal lines). */
  private[graft] def lineCleanOver(docs: DataFrame): DataFrame = {
    val lines = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p", "tok")))
      .withColumn("line_id", floor(col("p") / LineWidth).cast(LongType))
      .groupBy(col("doc_id"), col("line_id"))
      .agg(count(lit(1)).as("n_words"),
        expr("max_by(tok, p)").as("last_tok"),
        max(col("tok").isin(LineBlocklist: _*).cast(IntegerType)).as("has_block"))
    val judged = lines.select(col("doc_id"), col("n_words"),
      when(col("has_block") === 1, lit("blocklist"))
        .when(col("n_words") < MinLineWords, lit("short"))
        .when(!col("last_tok").isin(LineTerminals: _*), lit("no_terminal"))
        .otherwise(lit("kept")).as("verdict"))
    def cnt(v: String): Column =
      sum(when(col("verdict") === v, 1L).otherwise(0L))
    judged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        cnt("kept").as("kept_lines"),
        cnt("blocklist").as("dropped_blocklist"),
        cnt("short").as("dropped_short"),
        cnt("no_terminal").as("dropped_no_terminal"),
        sum(col("n_words")).as("n_tokens"),
        sum(when(col("verdict") === "kept", col("n_words")).otherwise(0L))
          .as("kept_tokens"))
      .withColumn("doc_kept", col("kept_lines") >= MinDocLines)
      .orderBy(col("doc_id"))
  }

  private lazy val lineCleanSql = {
    val terms = LineTerminals.map(t => s"'$t'").mkString(", ")
    val block = LineBlocklist.map(t => s"'$t'").mkString(", ")
    s"""WITH lct AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |lcp AS (
       |  SELECT doc_id, unnest(generate_series(1, len(ts))) AS p, unnest(ts) AS tok
       |  FROM lct),
       |lcl AS (
       |  SELECT doc_id, CAST((p - 1) // $LineWidth AS BIGINT) AS line_id,
       |         CAST(count(1) AS BIGINT) AS n_words,
       |         max_by(tok, p) AS last_tok,
       |         max(CASE WHEN tok IN ($block) THEN 1 ELSE 0 END) AS has_block
       |  FROM lcp GROUP BY 1, 2),
       |lcj AS (
       |  SELECT doc_id, n_words,
       |         CASE WHEN has_block = 1 THEN 'blocklist'
       |              WHEN n_words < $MinLineWords THEN 'short'
       |              WHEN last_tok NOT IN ($terms) THEN 'no_terminal'
       |              ELSE 'kept' END AS verdict
       |  FROM lcl)
       |SELECT doc_id, count(1) AS n_lines,
       |       CAST(sum(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
       |       CAST(sum(CASE WHEN verdict = 'blocklist' THEN 1 ELSE 0 END) AS BIGINT) AS dropped_blocklist,
       |       CAST(sum(CASE WHEN verdict = 'short' THEN 1 ELSE 0 END) AS BIGINT) AS dropped_short,
       |       CAST(sum(CASE WHEN verdict = 'no_terminal' THEN 1 ELSE 0 END) AS BIGINT) AS dropped_no_terminal,
       |       CAST(sum(n_words) AS BIGINT) AS n_tokens,
       |       CAST(sum(CASE WHEN verdict = 'kept' THEN n_words ELSE 0 END) AS BIGINT) AS kept_tokens,
       |       CAST(sum(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END) AS BIGINT) >= $MinDocLines AS doc_kept
       |FROM lcj GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q160: Gopher repetition battery -------------------------------

  /** Gopher table-A1 repetition thresholds (Rae et al. 2021): a doc
    * is repetition-filtered when any stat exceeds its bound. */
  private val DupLineMax = 0.30
  private val DupParaMax = 0.30
  private val Top2Max = 0.20
  private val Top3Max = 0.18
  private val Top4Max = 0.16
  /** dup-n-gram bounds for n = 5..10 (A1's 0.15 down to 0.10). */
  private val DupNMax: Map[Int, Double] =
    (5 to 10).map(n => n -> ((20 - n) / 100.0)).toMap
  /** "Paragraphs" at the fixture's grain: three LineWidth lines. */
  private val ParaWidth = 3 * LineWidth

  /** q160 — the FULL Gopher repetition battery (Rae et al. 2021 table
    * A1) at token grain, completing q61's two stats: duplicate-line
    * and duplicate-paragraph fractions (lines are the q158 fixture
    * rule — LineWidth-token windows; paragraphs are ParaWidth
    * windows, three lines — the corpus carries no newlines, so both
    * grains are fixture renderings of the paper's line/paragraph
    * split), top 2/3/4-gram token share, duplicate-n-gram token share
    * for every n in 5..10 at the paper's per-n thresholds, and the
    * composite `repetitive` gate. Documented grain deviation: the
    * paper's line/paragraph/dup-gram fractions are CHARACTER-grain;
    * tokens are the fixture's unit (as in q158's word gates), so all
    * fractions here are token-grain. Each dup-n-gram share counts
    * every occurrence of a gram seen more than once — overlapping
    * grams double-count tokens, so shares clamp to 1 (the
    * Dolma/NeMo-Curator reading of the stat).
    *
    * Scale: ONE posexplode of tokens feeds every pass; n-grams for
    * all nine n come from a single lead-chain window (the q152 rule —
    * a transform() gram array in its own Project re-inlines the
    * tokenizer into the scan filter via InferFiltersFromGenerate,
    * measured 12×), exploded as 9 tagged rows per position, then two
    * hash aggregations keyed (doc, n, gram) → (doc, n). Lines are one
    * (doc, line_id) aggregation. Everything shuffles on doc-prefixed
    * keys; no corpus-wide window, no join except the final
    * entity-sized assembles. */
  def gopherRepetition(s: SparkSession, dir: String): DataFrame =
    gopherRepetitionOver(Tables.t(s, dir, "documents"))

  /** The battery over any documents-shaped frame (the spec's seam for
    * planted repetitive docs). */
  private[graft] def gopherRepetitionOver(docs: DataFrame): DataFrame = {
    import graft.util.Parity.snapRound
    val ex = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p", "tok")))
    val wTok = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    def ld(k: Int): Column = lead(col("tok"), k).over(wTok)
    val leads = ex.select(
      Seq(col("doc_id"), col("p"), col("tok")) ++
        (1 to 9).map(k => ld(k).as(s"l$k")): _*)
    // nine tagged gram rows per position (n = 2..10); a position
    // without a full n-gram contributes NULL (filtered) — when()
    // gates on the LAST lead because concat_ws would silently skip
    // interior nulls
    def gramOf(n: Int): Column = {
      val parts = col("tok") +: (1 until n).map(k => col(s"l$k"))
      struct(lit(n.toLong).as("n"),
        when(col(s"l${n - 1}").isNotNull, concat_ws(" ", parts: _*)).as("g"))
    }
    val gramRows = leads
      .select(col("doc_id"), explode(array((2 to 10).map(gramOf): _*)).as("r"))
      .select(col("doc_id"), col("r.n").as("n"), col("r.g").as("g"))
      .filter(col("g").isNotNull)
    val gstat = gramRows
      .groupBy(col("doc_id"), col("n"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n"))
      .agg(max(col("c")).as("topc"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dupc"))
    val gramFeatCols =
      Seq(2, 3, 4).map(n => max(when(col("n") === n, col("topc"))).as(s"top${n}c")) ++
        (5 to 10).map(n => max(when(col("n") === n, col("dupc"))).as(s"dup${n}c"))
    val gramFeat = gstat.groupBy(col("doc_id"))
      .agg(gramFeatCols.head, gramFeatCols.tail: _*)
    // line/paragraph identity: each fixed-width window's tokens joined
    // in position order. Sliced DIRECTLY from the token array (one
    // explode of ceil(n/width) window strings per doc) instead of
    // re-exploding every token and re-assembling windows through a
    // (doc, win_id) collect_list + array_sort aggregation — that paid
    // a second full pass over the token rows and a per-window struct
    // sort for an order the array already has (guide §1.2/§2.4; the
    // transform stays INLINE in the generator select, the q152
    // InferFiltersFromGenerate rule). Window content is identical:
    // slice(toks, i·W+1, W) is exactly the tokens whose 0-based
    // positions floor to win_id = i, in position order.
    def windowDups(width: Long, unit: String) = docs
      // toks pre-projected in its own select (the shinglesOf PERF rule:
      // an inline split would re-tokenize once per window inside the
      // interpreted lambda); the transform stays inline in the
      // generator select (the q152 InferFiltersFromGenerate rule)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0L), ceil(size(col("toks")) / lit(width.toDouble)).cast(LongType) - 1),
        i => concat_ws(" ", slice(col("toks"), (i * width + 1).cast(IntegerType), lit(width.toInt))))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as(s"n_$unit"), sum(col("c") - 1).as(s"dup_$unit"))
    val lineFeat = windowDups(LineWidth, "lines")
    val paraFeat = windowDups(ParaWidth, "paras")
    // token count straight off the array length — the fourth pass over
    // the exploded token rows bought nothing size() doesn't know
    val nTok = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast(LongType).as("n_tokens"))
    def share(c: Column, n: Int): Column =
      snapRound(c.cast(DoubleType) * n / col("n_tokens"), 6)
    val dupShares = (5 to 10).map(n =>
      least(lit(1.0), share(coalesce(col(s"dup${n}c"), lit(0L)), n))
        .as(s"dup_${n}gram_frac"))
    val repetitive =
      (Seq(col("dup_line_frac") > DupLineMax,
        col("dup_para_frac") > DupParaMax,
        col("top_2gram_frac") > Top2Max,
        col("top_3gram_frac") > Top3Max,
        col("top_4gram_frac") > Top4Max) ++
        (5 to 10).map(n => col(s"dup_${n}gram_frac") > DupNMax(n)))
        .reduce(_ || _)
    nTok.join(lineFeat, "doc_id")
      .join(paraFeat, "doc_id")
      .join(gramFeat, Seq("doc_id"), "left")
      .select(Seq(col("doc_id"), col("n_tokens"), col("n_lines"),
        snapRound(col("dup_lines").cast(DoubleType) / col("n_lines"), 6)
          .as("dup_line_frac"),
        col("n_paras"),
        snapRound(col("dup_paras").cast(DoubleType) / col("n_paras"), 6)
          .as("dup_para_frac"),
        share(coalesce(col("top2c"), lit(0L)), 2).as("top_2gram_frac"),
        share(coalesce(col("top3c"), lit(0L)), 3).as("top_3gram_frac"),
        share(coalesce(col("top4c"), lit(0L)), 4).as("top_4gram_frac")) ++
        dupShares: _*)
      .withColumn("repetitive", repetitive)
      .orderBy(col("doc_id"))
  }

  private lazy val gopherRepetitionSql = {
    import graft.util.Parity.snapRoundSql
    val leadCols = (1 to 9).map(k => s"lead(tok, $k) OVER w AS l$k").mkString(",\n       |         ")
    val gramArms = (2 to 10).map { n =>
      val parts = "tok" +: (1 until n).map(k => s"l$k")
      s"SELECT doc_id, $n AS n, ${parts.mkString(" || ' ' || ")} AS g FROM grl WHERE l${n - 1} IS NOT NULL"
    }.mkString("\n       |  UNION ALL\n       |  ")
    val grfCols = Seq(2, 3, 4).map(n =>
      s"max(CASE WHEN n = $n THEN topc END) AS top${n}c") ++
      (5 to 10).map(n => s"max(CASE WHEN n = $n THEN dupc END) AS dup${n}c")
    val dupFracCols = (5 to 10).map(n =>
      s"least(1.0, ${snapRoundSql(s"CAST(coalesce(dup${n}c, 0) AS DOUBLE) * $n / n_tokens", 6)}) AS dup_${n}gram_frac")
    val dupFracNames = (5 to 10).map(n => s"dup_${n}gram_frac").mkString(", ")
    val dupGates = (5 to 10).map(n => s"dup_${n}gram_frac > ${DupNMax(n)}").mkString("\n       |        OR ")
    s"""WITH grt AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |grp AS (
       |  SELECT doc_id, unnest(generate_series(1, len(ts))) AS p, unnest(ts) AS tok
       |  FROM grt),
       |grl AS (
       |  SELECT doc_id, p, tok,
       |         $leadCols
       |  FROM grp WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
       |grg AS (
       |  $gramArms),
       |grs AS (
       |  SELECT doc_id, n, max(c) AS topc,
       |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dupc
       |  FROM (SELECT doc_id, n, g, CAST(count(1) AS BIGINT) AS c FROM grg GROUP BY 1, 2, 3)
       |  GROUP BY 1, 2),
       |grf AS (
       |  SELECT doc_id,
       |         ${grfCols.mkString(",\n       |         ")}
       |  FROM grs GROUP BY 1),
       |lns AS (
       |  SELECT doc_id, CAST((p - 1) // $LineWidth AS BIGINT) AS line_id,
       |         string_agg(tok, ' ' ORDER BY p) AS line
       |  FROM grp GROUP BY 1, 2),
       |lnf AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
       |         CAST(sum(c - 1) AS BIGINT) AS dup_lines
       |  FROM (SELECT doc_id, line, count(1) AS c FROM lns GROUP BY 1, 2)
       |  GROUP BY 1),
       |pns AS (
       |  SELECT doc_id, CAST((p - 1) // $ParaWidth AS BIGINT) AS para_id,
       |         string_agg(tok, ' ' ORDER BY p) AS para
       |  FROM grp GROUP BY 1, 2),
       |pnf AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_paras,
       |         CAST(sum(c - 1) AS BIGINT) AS dup_paras
       |  FROM (SELECT doc_id, para, count(1) AS c FROM pns GROUP BY 1, 2)
       |  GROUP BY 1),
       |ntk AS (SELECT doc_id, CAST(count(1) AS BIGINT) AS n_tokens FROM grp GROUP BY 1),
       |rep AS (
       |  SELECT ntk.doc_id, n_tokens, n_lines,
       |         ${snapRoundSql("CAST(dup_lines AS DOUBLE) / n_lines", 6)} AS dup_line_frac,
       |         n_paras,
       |         ${snapRoundSql("CAST(dup_paras AS DOUBLE) / n_paras", 6)} AS dup_para_frac,
       |         ${snapRoundSql("CAST(coalesce(top2c, 0) AS DOUBLE) * 2 / n_tokens", 6)} AS top_2gram_frac,
       |         ${snapRoundSql("CAST(coalesce(top3c, 0) AS DOUBLE) * 3 / n_tokens", 6)} AS top_3gram_frac,
       |         ${snapRoundSql("CAST(coalesce(top4c, 0) AS DOUBLE) * 4 / n_tokens", 6)} AS top_4gram_frac,
       |         ${dupFracCols.mkString(",\n       |         ")}
       |  FROM ntk JOIN lnf ON ntk.doc_id = lnf.doc_id
       |  JOIN pnf ON ntk.doc_id = pnf.doc_id
       |  LEFT JOIN grf ON ntk.doc_id = grf.doc_id)
       |SELECT doc_id, n_tokens, n_lines, dup_line_frac, n_paras, dup_para_frac,
       |       top_2gram_frac, top_3gram_frac, top_4gram_frac, $dupFracNames,
       |       (dup_line_frac > $DupLineMax OR dup_para_frac > $DupParaMax
       |        OR top_2gram_frac > $Top2Max
       |        OR top_3gram_frac > $Top3Max OR top_4gram_frac > $Top4Max
       |        OR $dupGates) AS repetitive
       |FROM rep
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q161: lexical diversity ----------------------------------------

  /** q161 — per-doc lexical diversity: unigram Shannon entropy (nats),
    * type-token ratio, and hapax-legomenon fraction — the standard
    * trio distinguishing natural text (entropy near ln of the doc's
    * effective vocabulary, TTR well below 1, a healthy hapax tail)
    * from template spam (low entropy, tiny TTR) and id-like noise
    * (TTR → 1 with no repeated structure); complements q160's
    * repetition battery from the distributional side.
    *
    * Parity: H = ln n − (Σ c·ln c)/n with each ln on an EXACT integer
    * snapped 6-dp (the q134 libm rule), so every c·ln(c) term is an
    * exact 6-dp rational; folding through DECIMAL(38,6) is exact and
    * order-independent, and its double conversion is safe while
    * Σ c·ln c < 2^53/10^6 ≈ 9e9 — a ~6×10^8-token single document,
    * far past any real doc. The remaining steps are single IEEE ops
    * on identical doubles, snapped 6-dp at the output.
    *
    * Scale: one (doc, token) count, one per-doc rollup — two hash
    * aggregations keyed on doc-prefixed keys, no window, no join. */
  def lexicalDiversity(s: SparkSession, dir: String): DataFrame =
    lexicalDiversityOver(Tables.t(s, dir, "documents"))

  private[graft] def lexicalDiversityOver(docs: DataFrame): DataFrame = {
    import graft.util.Parity.snapRound
    val tokc = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    tokc.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum((col("c").cast(DoubleType) * snapRound(log(col("c").cast(DoubleType)), 6))
          .cast(DecimalType(38, 6))).cast(DoubleType).as("sum_clnc"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        snapRound(snapRound(log(col("n_tokens").cast(DoubleType)), 6) -
          col("sum_clnc") / col("n_tokens"), 6).as("entropy"),
        snapRound(col("n_types").cast(DoubleType) / col("n_tokens"), 6).as("ttr"),
        snapRound(col("n_hapax").cast(DoubleType) / col("n_tokens"), 6).as("hapax_frac"))
      .orderBy(col("doc_id"))
  }

  private lazy val lexicalDiversitySql = {
    import graft.util.Parity.snapRoundSql
    val lnC = snapRoundSql("ln(CAST(c AS DOUBLE))", 6)
    val lnN = snapRoundSql("ln(CAST(n_tokens AS DOUBLE))", 6)
    s"""WITH ldt AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |ldp AS (SELECT doc_id, unnest(ts) AS tok FROM ldt),
       |ldc AS (SELECT doc_id, tok, CAST(count(1) AS BIGINT) AS c
       |        FROM ldp GROUP BY 1, 2),
       |lda AS (
       |  SELECT doc_id,
       |         CAST(sum(c) AS BIGINT) AS n_tokens,
       |         CAST(count(1) AS BIGINT) AS n_types,
       |         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       |         CAST(sum(CAST(CAST(c AS DOUBLE) * $lnC AS DECIMAL(38,6))) AS DOUBLE) AS sum_clnc
       |  FROM ldc GROUP BY 1)
       |SELECT doc_id, n_tokens, n_types, n_hapax,
       |       ${snapRoundSql(s"$lnN - sum_clnc / n_tokens", 6)} AS entropy,
       |       ${snapRoundSql("CAST(n_types AS DOUBLE) / n_tokens", 6)} AS ttr,
       |       ${snapRoundSql("CAST(n_hapax AS DOUBLE) / n_tokens", 6)} AS hapax_frac
       |FROM lda
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q63: vocabulary -------------------------------------------

  /** q63 — corpus vocabulary, top 500 tokens by total occurrences
    * (token ascending on ties): occurrence count + document frequency
    * via a two-level aggregation ((token, doc) partial counts, then
    * token rollup — no Expand, one shuffle each), ranked after the
    * top-k cut so the window sees 500 rows, not the vocabulary. */
  /** The top-500 vocabulary frame — q63's surface, reused by q92 as
    * the coverage reference. */
  private def vocabFrame(s: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("cnt"))
    perDoc.groupBy(col("token"))
      .agg(sum(col("cnt")).as("occurrences"), count(lit(1)).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("token"))
      .limit(500)
  }

  def vocabulary(s: SparkSession, dir: String): DataFrame =
    vocabFrame(s, dir).withColumn("rank",
      row_number().over(Window.orderBy(col("occurrences").desc, col("token"))))
      .select(col("rank"), col("token"), col("occurrences"), col("doc_freq"))
      .orderBy(col("rank"))

  /** q92 — vocabulary coverage / OOV profile per source: what share
    * of each source's token stream a tokenizer built from the q63
    * top-500 vocabulary would cover, plus the distinct out-of-vocab
    * token count — the coverage check run before committing to a
    * vocab size (a source with a high OOV rate is either noise or a
    * domain the vocabulary underserves). Scale: one (source, token)
    * two-level aggregation (the q63 shape), then the 500-row vocab
    * broadcasts against it — the token stream shuffles once, keyed
    * by (source, token), never joined at stream size. oov_rate is a
    * single IEEE division of exact long counts. */
  def oovProfile(s: SparkSession, dir: String): DataFrame = {
    val perTok = Tables.t(s, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("cnt"))
    val vocab = vocabFrame(s, dir).select(col("token"), lit(1).as("in_vocab"))
    perTok.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("total_tokens"),
        sum(when(col("in_vocab").isNotNull, col("cnt")).otherwise(0L)).as("covered_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("distinct_oov_tokens"))
      .select(col("source"), col("total_tokens"), col("covered_tokens"),
        (col("total_tokens") - col("covered_tokens")).as("oov_tokens"),
        ((col("total_tokens") - col("covered_tokens")).cast(DoubleType) /
          col("total_tokens").cast(DoubleType)).as("oov_rate"),
        col("distinct_oov_tokens"))
      .orderBy(col("source"))
  }

  private val oovProfileSql =
    """WITH perdoc AS (
      |  SELECT token, doc_id, count(1) AS cnt FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY 1, 2),
      |vocab AS (
      |  SELECT token FROM (
      |    SELECT token, CAST(sum(cnt) AS BIGINT) AS occurrences
      |    FROM perdoc GROUP BY 1
      |    ORDER BY occurrences DESC, token LIMIT 500)),
      |pertok AS (
      |  SELECT source, token, count(1) AS cnt FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY 1, 2),
      |f AS (
      |  SELECT p.source, p.cnt, v.token AS vt
      |  FROM pertok p LEFT JOIN vocab v ON p.token = v.token),
      |agg AS (
      |  SELECT source,
      |         CAST(sum(cnt) AS BIGINT) AS total_tokens,
      |         CAST(sum(CASE WHEN vt IS NOT NULL THEN cnt ELSE 0 END) AS BIGINT) AS covered_tokens,
      |         count(CASE WHEN vt IS NULL THEN 1 END) AS distinct_oov_tokens
      |  FROM f GROUP BY 1)
      |SELECT source, total_tokens, covered_tokens,
      |       total_tokens - covered_tokens AS oov_tokens,
      |       CAST(total_tokens - covered_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS oov_rate,
      |       distinct_oov_tokens
      |FROM agg ORDER BY source""".stripMargin

  private val vocabularySql =
    """WITH perdoc AS (
      |  SELECT token, doc_id, count(1) AS cnt FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY 1, 2),
      |vocab AS (
      |  SELECT token, CAST(sum(cnt) AS BIGINT) AS occurrences, count(1) AS doc_freq
      |  FROM perdoc GROUP BY 1
      |  ORDER BY occurrences DESC, token LIMIT 500)
      |SELECT CAST(row_number() OVER (ORDER BY occurrences DESC, token) AS INTEGER) AS rank,
      |       token, occurrences, doc_freq
      |FROM vocab
      |ORDER BY rank""".stripMargin

  // ---- q138: Zipf-law slope per source ------------------------------

  /** q138 — Zipf's-law fit per source: OLS slope/intercept/r² of
    * ln(freq) vs ln(rank) over each source's term-frequency spectrum —
    * the corpus-health diagnostic that flags machine-generated or
    * template-heavy sources (natural text sits near slope −1;
    * boilerplate spam is flatter, key-value dumps steeper; Zipf 1949,
    * and Gopher's per-source quality analyses use exactly this
    * spectrum shape). Parity: both logs are libm calls on EXACT
    * integer inputs snapped 4-dp (the q134 rule) then rescaled to
    * exact LONGS, so all five sufficient sums fold as codegen'd long
    * adds (the q128 discipline: |x|,|y| ≤ ~1.5e5 scaled, products
    * ≤ 2.3e10, sums exact in 64-bit up to ~4e8 terms per source).
    * The combines (n·Σxy − Σx·Σy …) multiply a sum by n_terms and
    * exceed 64-bit already at ~10k-term vocabularies (n·Σ(xy) ≈
    * 1e4 · 2.3e10·1e4 ≈ 2e18 < 2^63 ≈ 9.2e18 only barely), so they
    * route through exact 128-bit types — DECIMAL(38,0) here, HUGEINT
    * in the oracle; the same integer < 1e25 casts to the same double
    * on both. The only IEEE steps are the final divisions, snapped
    * from identical integers, with the SNAPPED slope nested in the
    * intercept (the q128 lesson). Scale: one
    * (source, term) aggregation, a per-source rank window over
    * vocabulary-sized rows, one reduction — the token stream shuffles
    * once and nothing fact-sized joins. */
  /** Exact 128-bit route for the OLS combines: DECIMAL(19,0) operands
    * multiply to DECIMAL(38,0) — scale stays 0, so no precision loss,
    * and ANSI errors loudly past 38 digits (values here are ≤ ~1e25). */
  private def dec128(c: Column): Column = c.cast(DecimalType(19, 0))

  def zipfSlope(s: SparkSession, dir: String): DataFrame = {
    import graft.util.Parity.{asScaled, snapRound}
    val tf = Tables.t(s, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("source")).orderBy(col("freq").desc, col("token"))
    val xy = tf.withColumn("rank", row_number().over(w))
      .select(col("source"),
        asScaled(snapRound(log(col("rank").cast(DoubleType)), 4), 4).as("xs"),
        asScaled(snapRound(log(col("freq").cast(DoubleType)), 4), 4).as("ys"))
    xy.groupBy(col("source")).agg(
        count(lit(1)).as("n_terms"), sum(col("xs")).as("sx"), sum(col("ys")).as("sy"),
        sum(col("xs") * col("ys")).as("sxy"), sum(col("xs") * col("xs")).as("sxx"),
        sum(col("ys") * col("ys")).as("syy"))
      .withColumn("num", dec128(col("n_terms")) * dec128(col("sxy")) -
        dec128(col("sx")) * dec128(col("sy")))
      .withColumn("den", dec128(col("n_terms")) * dec128(col("sxx")) -
        dec128(col("sx")) * dec128(col("sx")))
      .withColumn("deny", dec128(col("n_terms")) * dec128(col("syy")) -
        dec128(col("sy")) * dec128(col("sy")))
      .withColumn("slope", when(col("den") =!= 0,
        snapRound(col("num").cast(DoubleType) / col("den").cast(DoubleType), 6)))
      .select(col("source"), col("n_terms"), col("slope"),
        when(col("den") =!= 0, snapRound(
          (col("sy").cast(DoubleType) / lit(10000.0) -
            col("slope") * (col("sx").cast(DoubleType) / lit(10000.0))) /
            col("n_terms").cast(DoubleType), 6)).as("intercept"),
        when(col("den") =!= 0 && col("deny") =!= 0, snapRound(
          (col("num").cast(DoubleType) / col("den").cast(DoubleType)) *
            (col("num").cast(DoubleType) / col("deny").cast(DoubleType)), 6)).as("r2"))
      .orderBy(col("source"))
  }

  private lazy val zipfSlopeSql = {
    import graft.util.Parity.snapRoundSql
    val slope = "CASE WHEN den <> 0 THEN " +
      snapRoundSql("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)", 6) + " END"
    s"""WITH ztf AS (
       |  SELECT source, token, count(1) AS freq FROM (
       |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
       |  GROUP BY 1, 2),
       |zrk AS (
       |  SELECT source, freq,
       |         row_number() OVER (PARTITION BY source ORDER BY freq DESC, token) AS rank
       |  FROM ztf),
       |zxy AS (
       |  SELECT source,
       |         CAST(round(${snapRoundSql("ln(CAST(rank AS DOUBLE))", 4)} * 10000) AS BIGINT) AS xs,
       |         CAST(round(${snapRoundSql("ln(CAST(freq AS DOUBLE))", 4)} * 10000) AS BIGINT) AS ys
       |  FROM zrk),
       |zagg AS (
       |  SELECT source, count(1) AS n_terms,
       |         CAST(sum(xs) AS BIGINT) AS sx, CAST(sum(ys) AS BIGINT) AS sy,
       |         CAST(sum(xs * ys) AS BIGINT) AS sxy,
       |         CAST(sum(xs * xs) AS BIGINT) AS sxx,
       |         CAST(sum(ys * ys) AS BIGINT) AS syy
       |  FROM zxy GROUP BY 1),
       |zc AS (
       |  SELECT *, CAST(n_terms AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
       |         CAST(n_terms AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
       |         CAST(n_terms AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS deny
       |  FROM zagg),
       |zs AS (SELECT *, $slope AS slope FROM zc)
       |SELECT source, n_terms, slope,
       |       CASE WHEN den <> 0 THEN ${snapRoundSql(
      "(CAST(sy AS DOUBLE) / 10000.0 - slope * (CAST(sx AS DOUBLE) / 10000.0)) / CAST(n_terms AS DOUBLE)", 6)} END AS intercept,
       |       CASE WHEN den <> 0 AND deny <> 0 THEN ${snapRoundSql(
      "(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * (CAST(num AS DOUBLE) / CAST(deny AS DOUBLE))", 6)} END AS r2
       |FROM zs ORDER BY source""".stripMargin
  }

  // ---- q147: Heaps'-law vocabulary growth per source -----------------

  /** Equal-token-mass checkpoints the growth curve samples per source.
    * 10 points is the classic Heaps diagnostic resolution; the cost is
    * O(points) rows per source regardless of corpus size. */
  private val HeapsPoints = 10L

  /** q147 — Heaps'-law fit per source: OLS slope β (and r²) of
    * ln V(n) vs ln n, where V(n) is the number of distinct word types
    * seen in the source's first n tokens (docs concatenated in doc_id
    * order). Heaps 1978: natural text grows V(n) ≈ K·n^β with β ≈
    * 0.4–0.6; β near 1 flags id-like/unbounded vocabularies (bad BPE
    * inputs), β near 0 flags template spam — the companion diagnostic
    * to q138's Zipf slope (the two laws are duals). The curve is built
    * WITHOUT materializing prefixes: each (source, token)'s FIRST
    * occurrence position is one min-aggregation over the positioned
    * token stream, the checkpoint a first-occurrence lands in is
    * integer arithmetic (j = ⌈P·fp/T⌉, exact in 64-bit for corpora to
    * ~9e17 tokens), and V at checkpoint j is a cumulative sum over the
    * P-row-per-source dense grid. Parity: both lns are libm calls on
    * EXACT integer inputs snapped 4-dp then rescaled to exact longs
    * (the q138 rule); sums fold as codegen'd long adds; the OLS
    * combines route through DECIMAL(38,0)/HUGEINT (the q138 128-bit
    * route); the only IEEE steps are the final divisions on identical
    * integers. Scale: doc stream offsets come from the q142 TWO-LEVEL
    * exact prefix sum (per-(source, doc_id-range-group) cumsum +
    * broadcast group offsets — never a single-partition-per-source
    * window over the corpus), then one (source, token) min-agg of the
    * exploded stream (map-side combine), and everything downstream is
    * P rows per source. Assumes each source holds ≥ P tokens (any
    * real shard does). */
  def heapsLaw(s: SparkSession, dir: String): DataFrame =
    heapsLawOver(s, Tables.t(s, dir, "documents"))

  /** The fit over any documents-shaped frame (the seam the spec uses
    * to plant all-distinct / fixed-vocab corpora and watch β find 1
    * and 0). */
  private[graft] def heapsLawOver(s: SparkSession, docs: DataFrame): DataFrame = {
    import graft.util.Parity.{asScaled, snapRound}
    val sized = docs
      .select(col("source"), col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("source"), col("doc_id"), col("toks"),
        size(col("toks")).cast(LongType).as("n_toks"))
    // per-source doc offsets via the q142 two-level exact prefix sum
    // (PackGroup-width doc_id groups + broadcast per-(source, group)
    // offsets); value-identical to a naive per-source cumsum — the
    // sf0.01 oracle (which uses the naive window) hash-proves it
    val wIn = Window.partitionBy(col("source"), col("grp")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val grouped = sized
      .withColumn("grp", floor(col("doc_id") / PackGroup).cast(LongType))
      .withColumn("in_grp", coalesce(sum(col("n_toks")).over(wIn), lit(0L)))
    val wg = Window.partitionBy(col("source")).orderBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val gOffs = grouped.groupBy(col("source"), col("grp"))
      .agg(sum(col("n_toks")).as("g_total"))
      .withColumn("g_off", coalesce(sum(col("g_total")).over(wg), lit(0L)))
      .select(col("source"), col("grp"), col("g_off"))
    val positioned = grouped.join(broadcast(gOffs), Seq("source", "grp"))
      .withColumn("off", col("g_off") + col("in_grp"))
      .select(col("source"), col("off"), posexplode(col("toks")).as(Seq("i", "token")))
      .select(col("source"), col("token"), (col("off") + col("i") + lit(1L)).as("pos"))
    val firstPos = positioned.groupBy(col("source"), col("token"))
      .agg(min(col("pos")).as("fp"))
    // sources with fewer than HeapsPoints tokens would put n_at=0 on
    // the grid and ln(0)=-Inf through the snap — where the two engines
    // DIVERGE (Spark nulls on the decimal cast, DuckDB errors on the
    // infinity cast). Exclude them identically in both engines (r11
    // advice): a sub-10-token source has no fittable growth curve.
    val totals = sized.groupBy(col("source")).agg(sum(col("n_toks")).as("t_total"))
      .filter(col("t_total") >= HeapsPoints)
    // smallest checkpoint j in 1..P with fp <= floor(j*T/P): exact
    // integer ceil-division (fp*P < 2^63 for any corpus under ~9e17
    // tokens per source)
    val newTypes = firstPos.join(broadcast(totals), "source")
      .select(col("source"),
        expr(s"CAST((fp * $HeapsPoints + t_total - 1) DIV t_total AS BIGINT)").as("j"))
      .groupBy(col("source"), col("j")).agg(count(lit(1)).as("new_types"))
    // dense P-row grid so checkpoints with no NEW types still emit
    // their (flat) V point — the fit sees all P samples
    val grid = totals.select(col("source"), col("t_total"),
      explode(sequence(lit(1L), lit(HeapsPoints))).as("j"))
    val curve = grid.join(newTypes, Seq("source", "j"), "left")
      .na.fill(0L, Seq("new_types"))
      .withColumn("v", sum(col("new_types")).over(
        Window.partitionBy(col("source")).orderBy(col("j"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_at", expr(s"CAST((j * t_total) DIV $HeapsPoints AS BIGINT)"))
    val xy = curve.select(col("source"), col("t_total"), col("v"),
      asScaled(snapRound(log(col("n_at").cast(DoubleType)), 4), 4).as("xs"),
      asScaled(snapRound(log(col("v").cast(DoubleType)), 4), 4).as("ys"))
    xy.groupBy(col("source")).agg(
        max(col("t_total")).as("total_tokens"),
        max(col("v")).as("vocab_size"),
        count(lit(1)).as("n_points"),
        sum(col("xs")).as("sx"), sum(col("ys")).as("sy"),
        sum(col("xs") * col("ys")).as("sxy"), sum(col("xs") * col("xs")).as("sxx"),
        sum(col("ys") * col("ys")).as("syy"))
      .withColumn("num", dec128(col("n_points")) * dec128(col("sxy")) -
        dec128(col("sx")) * dec128(col("sy")))
      .withColumn("den", dec128(col("n_points")) * dec128(col("sxx")) -
        dec128(col("sx")) * dec128(col("sx")))
      .withColumn("deny", dec128(col("n_points")) * dec128(col("syy")) -
        dec128(col("sy")) * dec128(col("sy")))
      .select(col("source"), col("total_tokens"), col("vocab_size"),
        col("n_points"),
        when(col("den") =!= 0,
          snapRound(col("num").cast(DoubleType) / col("den").cast(DoubleType), 6))
          .as("beta"),
        when(col("den") =!= 0 && col("deny") =!= 0, snapRound(
          (col("num").cast(DoubleType) / col("den").cast(DoubleType)) *
            (col("num").cast(DoubleType) / col("deny").cast(DoubleType)), 6)).as("r2"))
      .orderBy(col("source"))
  }

  private lazy val heapsLawSql = {
    import graft.util.Parity.snapRoundSql
    s"""WITH hd AS (
       |  SELECT source, doc_id, string_split(text, ' ') AS ts,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
       |  FROM documents),
       |ho AS (
       |  SELECT source, ts,
       |         CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks AS BIGINT) AS off
       |  FROM hd),
       |hp AS (
       |  SELECT source, off + unnest(generate_series(1, len(ts))) AS pos,
       |         unnest(ts) AS token
       |  FROM ho),
       |hf AS (SELECT source, token, min(pos) AS fp FROM hp GROUP BY 1, 2),
       |ht AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS t_total FROM hd GROUP BY 1
       |       HAVING CAST(sum(n_toks) AS BIGINT) >= $HeapsPoints),
       |hb AS (
       |  SELECT f.source, (f.fp * $HeapsPoints + t.t_total - 1) // t.t_total AS j,
       |         count(1) AS new_types
       |  FROM hf f JOIN ht t USING (source) GROUP BY 1, 2),
       |hg AS (SELECT source, t_total, unnest(generate_series(1, $HeapsPoints)) AS j FROM ht),
       |hv AS (
       |  SELECT g.source, g.t_total, g.j,
       |         CAST(sum(coalesce(b.new_types, 0)) OVER (PARTITION BY g.source ORDER BY g.j
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS v,
       |         (g.j * g.t_total) // $HeapsPoints AS n_at
       |  FROM hg g LEFT JOIN hb b ON g.source = b.source AND g.j = b.j),
       |hxy AS (
       |  SELECT source, t_total, v,
       |         CAST(round(${snapRoundSql("ln(CAST(n_at AS DOUBLE))", 4)} * 10000) AS BIGINT) AS xs,
       |         CAST(round(${snapRoundSql("ln(CAST(v AS DOUBLE))", 4)} * 10000) AS BIGINT) AS ys
       |  FROM hv),
       |hagg AS (
       |  SELECT source, max(t_total) AS total_tokens, max(v) AS vocab_size,
       |         count(1) AS n_points,
       |         CAST(sum(xs) AS BIGINT) AS sx, CAST(sum(ys) AS BIGINT) AS sy,
       |         CAST(sum(xs * ys) AS BIGINT) AS sxy,
       |         CAST(sum(xs * xs) AS BIGINT) AS sxx,
       |         CAST(sum(ys * ys) AS BIGINT) AS syy
       |  FROM hxy GROUP BY 1),
       |hc AS (
       |  SELECT *, CAST(n_points AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
       |         CAST(n_points AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
       |         CAST(n_points AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS deny
       |  FROM hagg)
       |SELECT source, total_tokens, vocab_size, n_points,
       |       CASE WHEN den <> 0 THEN ${snapRoundSql(
      "CAST(num AS DOUBLE) / CAST(den AS DOUBLE)", 6)} END AS beta,
       |       CASE WHEN den <> 0 AND deny <> 0 THEN ${snapRoundSql(
      "(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * (CAST(num AS DOUBLE) / CAST(deny AS DOUBLE))", 6)} END AS r2
       |FROM hc ORDER BY source""".stripMargin
  }

  // ---- q139: source-pair Jensen–Shannon divergence ------------------

  /** ln 2 as the same decimal literal on both engines (the JSD
    * contribution of a term PRESENT in one source and absent in the
    * other is exactly p·ln2). */
  private val Ln2Sql = "0.6931471805599453"

  /** q139 — Jensen–Shannon divergence between every source pair's
    * unigram distributions (Lin 1991): the similarity matrix behind
    * dataset-merging and mixture-design decisions — two sources with
    * JSD ≈ 0 are the same distribution twice (dedup the SOURCES, not
    * just documents), JSD → ln 2 means disjoint vocabularies. Computed
    * exactly from the decomposition: terms shared by both sources
    * contribute p·ln(2p/(p+q)) and q·ln(2q/(p+q)); a term private to
    * one side contributes p·ln2, and those sum to ln2·(1 − P_shared)
    * per side — so only the SHARED-term join is ever materialized.
    * Every source pair gets a row: pairs sharing ZERO terms (the
    * shared-term join finds nothing) are restored from the full
    * source-pair grid — sources² is tiny, derived from the broadcast
    * marginals — with n_shared_terms = 0 and jsd = ln 2 exactly (the
    * disjoint-vocabulary maximum, the strongest do-not-merge signal;
    * omitting such a pair would make it indistinguishable from a
    * pair the matrix never covered).
    * Parity: every ln argument is an exact integer rational
    * (2·c_a·N_b / (c_a·N_b + c_b·N_a) — products ≤ ~2e11 at sf0.1,
    * exact in long and double; re-derive the bound before 100×), ln
    * snaps 6-dp (q134 rule), per-term contributions snap and fold
    * through DECIMAL(38,10). Scale: the pair expansion is keyed on
    * TERM (each term joins its ≤|sources| rows — the q126 bound, with
    * sources² « vocab), marginals are sources-sized and broadcast. */
  def sourceJsd(s: SparkSession, dir: String): DataFrame = {
    import graft.util.Parity.snapRound
    val st = Tables.t(s, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
    val tot = st.groupBy(col("source")).agg(sum(col("c")).as("nn"))
    val ln2 = lit(0.6931471805599453)
    val shared = st.as("a").join(st.as("b"),
        col("a.token") === col("b.token") && col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("a.c").as("ca"), col("b.c").as("cb"))
      .join(broadcast(tot.select(col("source").as("source_a"), col("nn").as("na"))), "source_a")
      .join(broadcast(tot.select(col("source").as("source_b"), col("nn").as("nb"))), "source_b")
    val lnA = snapRound(log((lit(2) * col("ca") * col("nb")).cast(DoubleType) /
      (col("ca") * col("nb") + col("cb") * col("na")).cast(DoubleType)), 6)
    val lnB = snapRound(log((lit(2) * col("cb") * col("na")).cast(DoubleType) /
      (col("ca") * col("nb") + col("cb") * col("na")).cast(DoubleType)), 6)
    def dsum(c: Column) = sum(c.cast(DecimalType(38, 10))).cast(DoubleType)
    val agg = shared
      .select(col("source_a"), col("source_b"), col("ca"), col("cb"),
        col("na"), col("nb"),
        snapRound((col("ca").cast(DoubleType) / col("na").cast(DoubleType)) * lnA, 6).as("ta"),
        snapRound((col("cb").cast(DoubleType) / col("nb").cast(DoubleType)) * lnB, 6).as("tb"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared_terms"),
        sum(col("ca")).as("sca"), sum(col("cb")).as("scb"),
        dsum(col("ta")).as("la"), dsum(col("tb")).as("lb"))
    // the full source-pair grid (sources²/2, from the tiny marginals):
    // left-joining the shared-term aggregate restores pairs with no
    // shared term at all — coalesced to sca = scb = 0, la = lb = 0,
    // the formula below reduces to exactly ln 2 for them
    val grid = tot.select(col("source").as("source_a"), col("nn").as("na"))
      .join(tot.select(col("source").as("source_b"), col("nn").as("nb")),
        col("source_a") < col("source_b"))
    grid.join(broadcast(agg), Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_shared_terms"), lit(0L)).as("n_shared_terms"),
        snapRound(
          (ln2 * (lit(1.0) - coalesce(col("sca"), lit(0L)).cast(DoubleType) / col("na").cast(DoubleType)) +
            coalesce(col("la"), lit(0.0))) / lit(2.0) +
          (ln2 * (lit(1.0) - coalesce(col("scb"), lit(0L)).cast(DoubleType) / col("nb").cast(DoubleType)) +
            coalesce(col("lb"), lit(0.0))) / lit(2.0),
          6).as("jsd"))
      .orderBy(col("source_a"), col("source_b"))
  }

  private lazy val sourceJsdSql = {
    import graft.util.Parity.snapRoundSql
    val lnA = snapRoundSql(
      "ln(CAST(2 * ca * nb AS DOUBLE) / CAST(ca * nb + cb * na AS DOUBLE))", 6)
    val lnB = snapRoundSql(
      "ln(CAST(2 * cb * na AS DOUBLE) / CAST(ca * nb + cb * na AS DOUBLE))", 6)
    s"""WITH jst AS (
       |  SELECT source, token, count(1) AS c FROM (
       |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
       |  GROUP BY 1, 2),
       |jtot AS (SELECT source, CAST(sum(c) AS BIGINT) AS nn FROM jst GROUP BY 1),
       |jsh AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |         a.c AS ca, b.c AS cb, ta.nn AS na, tb.nn AS nb
       |  FROM jst a JOIN jst b ON a.token = b.token AND a.source < b.source
       |  JOIN jtot ta ON a.source = ta.source
       |  JOIN jtot tb ON b.source = tb.source),
       |jterms AS (
       |  SELECT source_a, source_b, ca, cb, na, nb,
       |         ${snapRoundSql(s"(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)) * ($lnA)", 6)} AS ta,
       |         ${snapRoundSql(s"(CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) * ($lnB)", 6)} AS tb
       |  FROM jsh),
       |jagg AS (
       |  SELECT source_a, source_b, count(1) AS n_shared_terms,
       |         CAST(sum(ca) AS BIGINT) AS sca, CAST(sum(cb) AS BIGINT) AS scb,
       |         CAST(sum(CAST(ta AS DECIMAL(38,10))) AS DOUBLE) AS la,
       |         CAST(sum(CAST(tb AS DECIMAL(38,10))) AS DOUBLE) AS lb
       |  FROM jterms GROUP BY 1, 2),
       |jgrid AS (
       |  SELECT a.source AS source_a, b.source AS source_b, a.nn AS na, b.nn AS nb
       |  FROM jtot a JOIN jtot b ON a.source < b.source)
       |SELECT g.source_a, g.source_b,
       |       coalesce(j.n_shared_terms, 0) AS n_shared_terms,
       |       ${snapRoundSql(
      s"($Ln2Sql * (1.0 - CAST(coalesce(j.sca, 0) AS DOUBLE) / CAST(g.na AS DOUBLE)) + coalesce(j.la, 0.0)) / 2.0 + " +
        s"($Ln2Sql * (1.0 - CAST(coalesce(j.scb, 0) AS DOUBLE) / CAST(g.nb AS DOUBLE)) + coalesce(j.lb, 0.0)) / 2.0", 6)} AS jsd
       |FROM jgrid g LEFT JOIN jagg j
       |  ON g.source_a = j.source_a AND g.source_b = j.source_b
       |ORDER BY g.source_a, g.source_b""".stripMargin
  }

  // ---- q84: count-min heavy hitters --------------------------------

  private val CmDepth = graft.functions.CountMin.DefaultDepth
  private val CmWidth = graft.functions.CountMin.DefaultWidth

  /** q84 — heavy hitters via the count-min frequency sketch
    * (graft.functions.CountMin): the corpus token stream sketched into
    * a depth×width counter matrix, then the top-20 tokens (by exact
    * count, token ascending on ties) scored against it. Output shows
    * the sketch's guarantees live: cm_estimate ≥ exact_cnt always,
    * overcount bounded by εN. The sketch is pure hashing + addition,
    * so — unlike order-dependent frequency summaries — the estimates
    * are rerun-stable and the DuckDB oracle recomputes them
    * bit-identically.
    *
    * Scale: the sketch pass partial-aggregates to ≤ depth×width
    * counter rows per partition regardless of corpus size, and the
    * estimate join broadcasts the (tiny) sketch. The exact counts here
    * are the verification surface; a 100 TB profiler keeps only the
    * sketch and estimates whatever keys it cares about. */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.t(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("term"))
    val sk = graft.functions.CountMin.sketch(toks, col("term"), CmDepth, CmWidth)
    val top = toks.groupBy(col("term")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term")).limit(20)
    val est = graft.functions.CountMin.estimate(sk, top, col("term"), CmDepth, CmWidth)
    top.join(est, top("term") === est("key"))
      .select(col("term"), col("exact_cnt"), col("cm_estimate"),
        (col("cm_estimate") - col("exact_cnt")).as("overcount"))
      .orderBy(col("exact_cnt").desc, col("term"))
  }

  private val cmsHeavyHittersSql = {
    val bucket = (of: String) =>
      s"('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || $of), 1, 15))::BIGINT % $CmWidth"
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS term
       |  FROM documents WHERE text IS NOT NULL),
       |rows_j AS (SELECT unnest(generate_series(0, ${CmDepth - 1})) AS j),
       |sketch AS (
       |  SELECT j, ${bucket("term")} AS b, count(1) AS cnt
       |  FROM toks, rows_j GROUP BY 1, 2),
       |top AS (
       |  SELECT term, count(1) AS exact_cnt FROM toks GROUP BY 1
       |  ORDER BY exact_cnt DESC, term LIMIT 20),
       |kb AS (
       |  SELECT term, j, ${bucket("term")} AS b FROM top, rows_j),
       |est AS (
       |  SELECT kb.term, min(s.cnt) AS cm_estimate
       |  FROM kb JOIN sketch s ON kb.j = s.j AND kb.b = s.b GROUP BY 1)
       |SELECT t.term, t.exact_cnt, e.cm_estimate,
       |       e.cm_estimate - t.exact_cnt AS overcount
       |FROM top t JOIN est e ON t.term = e.term
       |ORDER BY t.exact_cnt DESC, t.term""".stripMargin
  }

  // ---- q65: language × source coverage pivot ----------------------

  /** The corpus's language set — pinned so the pivot's output schema
    * is static (a dynamic pivot would scan once just to discover
    * columns; at 100 TB the language list is configuration, not
    * data). */
  private val Langs = Seq("de", "en", "es", "fr", "zh")

  /** q65 — relational PIVOT: the per-source language coverage matrix
    * every corpus report starts with (one row per source, one count
    * column per language). Spark's groupBy.pivot with an explicit
    * value list is ONE aggregation pass — no per-language scan;
    * missing combinations fill 0 like the oracle's conditional
    * counts. */
  def langSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.t(s, dir, "documents")
      .groupBy(col("source"))
      .pivot("lang", Langs)
      .agg(count(lit(1)))
      .na.fill(0L, Langs)
    m.select(col("source") +: Langs.map(l => col(l).as(l)) :+
        Langs.map(l => col(l)).reduce(_ + _).as("total"): _*)
      .orderBy(col("source"))
  }

  private val langSourceMatrixSql = {
    val cells = Langs.map(l => s"count(CASE WHEN lang = '$l' THEN 1 END) AS $l")
      .mkString(",\n       ")
    val total = Langs.map(l => s"count(CASE WHEN lang = '$l' THEN 1 END)").mkString(" + ")
    s"""SELECT source,
       |       $cells,
       |       $total AS total
       |FROM documents
       |GROUP BY source
       |ORDER BY source NULLS FIRST""".stripMargin
  }

  // ---- q67: PII redaction -----------------------------------------

  // ASCII-only character classes on purpose: Java regex and DuckDB's
  // RE2 disagree on unicode \w/\d semantics (cross-engine parity trap)
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** q67 — PII scrub, the redaction pass every shareable training
    * corpus runs before packing: count + mask email addresses and
    * phone numbers. The fixture text is synthetic (PII-free), so the
    * query first INJECTS deterministic PII derived from doc_id — the
    * redaction regexes then have real matches to find, and the oracle
    * verifies the scrub byte-for-byte on the full redacted text.
    * Scale: a narrow per-row map — no shuffle, no UDF (regexp_replace
    * / regexp_extract_all are codegen'd). */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val injected = when(pmod(col("doc_id"), lit(3)) === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or admin@data-corp.io")))
      .when(pmod(col("doc_id"), lit(3)) === 1,
        concat(col("text"), lit(" call 415-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast(StringType), 4, "0"),
          lit(" now")))
      .otherwise(col("text"))
    Tables.t(s, dir, "documents")
      .withColumn("dirty", injected)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("dirty"), lit(EmailRe), lit(0)))
          .cast(LongType).as("n_emails"),
        size(regexp_extract_all(col("dirty"), lit(PhoneRe), lit(0)))
          .cast(LongType).as("n_phones"),
        regexp_replace(regexp_replace(col("dirty"), EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]").as("redacted"))
      .withColumn("clean_len", length(col("redacted")).cast(LongType))
      .orderBy(col("doc_id"))
  }

  private val piiRedactSql = {
    val injected =
      """CASE WHEN doc_id % 3 = 0
        |       THEN text || ' contact user' || doc_id || '@example.com or admin@data-corp.io'
        |     WHEN doc_id % 3 = 1
        |       THEN text || ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
        |     ELSE text END""".stripMargin
    // DuckDB regexp_replace replaces only the FIRST match without 'g'
    s"""WITH dirty AS (SELECT doc_id, $injected AS dirty FROM documents)
       |SELECT doc_id,
       |       CAST(len(regexp_extract_all(dirty, '$EmailRe')) AS BIGINT) AS n_emails,
       |       CAST(len(regexp_extract_all(dirty, '$PhoneRe')) AS BIGINT) AS n_phones,
       |       regexp_replace(regexp_replace(dirty, '$EmailRe', '[EMAIL]', 'g'),
       |                      '$PhoneRe', '[PHONE]', 'g') AS redacted,
       |       CAST(length(regexp_replace(regexp_replace(dirty, '$EmailRe', '[EMAIL]', 'g'),
       |                      '$PhoneRe', '[PHONE]', 'g')) AS BIGINT) AS clean_len
       |FROM dirty
       |ORDER BY doc_id""".stripMargin
  }

  // ---- q68: weighted corpus mixing --------------------------------

  /** Target mixture weights (per-mille of the doc budget) — at 100 TB
    * this is run configuration, like the pinned language list. */
  private val MixWeights: Seq[(String, Int)] =
    Seq(("src0", 400), ("src1", 300), ("src2", 200), ("src3", 100))
  private val MixBudgetDocs = 60L

  /** q68 — corpus mixing: hit per-source document targets
    * (budget × weight) by computing each source's keep-rate FROM its
    * measured size, then sampling with the q59 deterministic keyed
    * coin. This is the op that turns "40% web, 30% code…" recipes
    * into a physical sample. Integer math end to end (targets and
    * per-mille rates are exact in both engines). Scale: one tiny
    * per-source count aggregate, broadcast back onto the corpus, then
    * a narrow filter — the corpus itself never shuffles. */
  def corpusMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(s, dir, "documents")
    val target = MixWeights.foldLeft(lit(0L)) { case (acc, (src, w)) =>
      when(col("source") === src, lit(MixBudgetDocs * w / 1000)).otherwise(acc) }
    val rates = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("source_count"))
      .withColumn("target_docs", target)
      // `div`, not `/`: Spark's divide on BIGINTs yields DOUBLE while
      // DuckDB's `//` stays integral — div matches the oracle exactly
      .withColumn("rate_permille",
        least(lit(1000L), expr("1000 * target_docs div source_count")))
    docs.join(broadcast(rates), "source")
      .withColumn("bucket", permilleBucket(col("doc_id")))
      .filter(col("bucket") < col("rate_permille"))
      .groupBy(col("source"), col("source_count"), col("target_docs"),
        col("rate_permille"))
      .agg(count(lit(1)).as("kept_docs"))
      .orderBy(col("source"))
  }

  private val corpusMixSql = {
    val targetSql = MixWeights.map { case (src, w) =>
      s"WHEN source = '$src' THEN ${MixBudgetDocs * w / 1000}" }
      .mkString("CASE ", " ", " ELSE 0 END")
    val bucketSql = permilleBucketSql("doc_id")
    s"""WITH rates AS (
       |  SELECT source, count(1) AS source_count,
       |         $targetSql AS target_docs,
       |         least(1000, 1000 * ($targetSql) // count(1)) AS rate_permille
       |  FROM documents GROUP BY source)
       |SELECT source, source_count, target_docs, rate_permille,
       |       count(1) AS kept_docs
       |FROM documents JOIN rates USING (source)
       |WHERE $bucketSql < rate_permille
       |GROUP BY 1, 2, 3, 4
       |ORDER BY source""".stripMargin
  }

  // ---- q106: temperature-scaled source sampling --------------------

  /** Doc budget for the temperature mix (run configuration at scale,
    * like MixBudgetDocs). */
  private val TempBudgetDocs = 200L

  /** q106 — temperature-scaled source sampling (the multilingual-
    * training mix rule, mBERT/XLM/mT5 family): sample source i with
    * probability q_i ∝ p_i^α, α = 1/2 — upweighting low-resource
    * sources relative to their natural share, the standard correction
    * for head-heavy corpora (α = 1 is q68's proportional mix; α → 0
    * approaches uniform). α is FIXED at 1/2 deliberately: the weight
    * is then sqrt(n), the one power IEEE 754 requires to be correctly
    * rounded — a general pow() is libm-implementation-varying and
    * could not be hash-verified cross-engine. Weights snap to 8 dp and
    * sum through decimal (order-independent), keep-rates derive in
    * per-mille like q68, and the sample is the same deterministic
    * keyed coin. Scale: one tiny per-source aggregate broadcast back;
    * the corpus never shuffles. */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    import graft.util.Parity.snapRound
    val docs = Tables.t(s, dir, "documents")
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("source_count"))
      .withColumn("w", snapRound(sqrt(col("source_count").cast(DoubleType)), 8))
    val wsum = counts.agg(
      sum(col("w").cast(DecimalType(38, 8))).cast(DoubleType).as("wsum"))
    val rates = counts.crossJoin(broadcast(wsum))
      .withColumn("rate_permille",
        least(lit(1000L), floor(lit(1000.0) * lit(TempBudgetDocs.toDouble) *
          col("w") / col("wsum") / col("source_count").cast(DoubleType))))
      .select(col("source"), col("source_count"), col("w"), col("rate_permille"))
    docs.join(broadcast(rates), "source")
      .withColumn("bucket", permilleBucket(col("doc_id")))
      .filter(col("bucket") < col("rate_permille"))
      .groupBy(col("source"), col("source_count"), col("w"), col("rate_permille"))
      .agg(count(lit(1)).as("kept_docs"))
      .orderBy(col("source"))
  }

  private val temperatureMixSql = {
    import graft.util.Parity.snapRoundSql
    s"""WITH counts AS (
       |  SELECT source, count(1) AS source_count,
       |         ${snapRoundSql("sqrt(CAST(count(1) AS DOUBLE))", 8)} AS w
       |  FROM documents GROUP BY 1),
       |wsum AS (SELECT CAST(sum(CAST(w AS DECIMAL(38,8))) AS DOUBLE) AS wsum FROM counts),
       |rates AS (
       |  SELECT source, source_count, w,
       |         least(1000, CAST(floor(1000.0 * ${TempBudgetDocs.toDouble} * w
       |           / wsum / CAST(source_count AS DOUBLE)) AS BIGINT)) AS rate_permille
       |  FROM counts, wsum)
       |SELECT source, source_count, w, rate_permille, count(1) AS kept_docs
       |FROM documents JOIN rates USING (source)
       |WHERE ${permilleBucketSql("doc_id")} < rate_permille
       |GROUP BY 1, 2, 3, 4
       |ORDER BY source""".stripMargin
  }

  // ---- q69: inter-document span dedup -----------------------------

  /** Span width in tokens — 8 catches the fixture's near-duplicate
    * overlap (58/500 docs share at least one span); production would
    * tune per corpus (C4 used 3-sentence spans). */
  private val SpanTokens = 8

  /** q69 — inter-document repetition removal (the C4 / MassiveText
    * dedup pass that q61's INTRA-doc profile does not cover): chunk
    * every document into non-overlapping `SpanTokens`-token spans; a
    * span occurrence is kept iff its document is the span's FIRST
    * owner (minimum doc_id) corpus-wide. Emits the per-doc keep
    * accounting a curation run reports.
    * Scale: spans never carry their text into the shuffle — the
    * md5 span hash (32 chars, bounded) is the only key; the owner
    * aggregation partial-combines map-side, and the spans frame joins
    * it back on the same hash. Span construction is a narrow map
    * (slice over the token array, no explode-then-regroup). */
  def spanDedup(s: SparkSession, dir: String): DataFrame = {
    val spanArr = expr(
      s"""CASE WHEN size(toks) = 0 THEN CAST(array() AS ARRAY<STRING>)
         |ELSE transform(sequence(0, CAST(ceil(size(toks) / $SpanTokens.0) AS INT) - 1),
         |       i -> md5(array_join(slice(toks, i * $SpanTokens + 1, $SpanTokens), ' ')))
         |END""".stripMargin)
    val spans = Tables.t(s, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), posexplode(spanArr).as(Seq("span_idx", "h")))
    val owners = spans.groupBy(col("h")).agg(min(col("doc_id")).as("owner"))
    spans.join(owners, "h")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L)).as("kept_spans"))
      .withColumn("dup_spans", col("n_spans") - col("kept_spans"))
      // one IEEE division of exact integer counts — bit-identical
      .withColumn("kept_fraction",
        col("kept_spans").cast(DoubleType) / col("n_spans").cast(DoubleType))
      .orderBy(col("doc_id"))
  }

  private val spanDedupSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |idx AS (SELECT doc_id, toks,
       |               unnest(generate_series(0, CAST(ceil(len(toks) / $SpanTokens.0) AS INT) - 1)) AS i
       |        FROM t),
       |spans AS (SELECT doc_id, i AS span_idx,
       |                 md5(array_to_string(list_slice(toks, i * $SpanTokens + 1, i * $SpanTokens + $SpanTokens), ' ')) AS h
       |          FROM idx),
       |owners AS (SELECT h, min(doc_id) AS owner FROM spans GROUP BY h)
       |SELECT doc_id, count(1) AS n_spans,
       |       CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS kept_spans,
       |       CAST(count(1) - sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
       |       CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(1) AS kept_fraction
       |FROM spans JOIN owners USING (h)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---- q72: document chunking (RAG / context-window prep) ---------

  /** Chunk window / stride in tokens — 64-token chunks every 48
    * tokens (16-token overlap so no boundary-spanning content is lost
    * to retrieval). Run configuration at scale, like the pinned
    * language list. */
  private val ChunkTokens = 64
  private val ChunkStride = 48

  /** q72 — overlapping token-window chunking: the prep step every
    * RAG / embedding-indexing pipeline runs between cleaning and
    * embedding — documents become (doc_id, chunk_idx, chunk_text)
    * rows, each at most `ChunkTokens` tokens, starting every
    * `ChunkStride` (the final chunk may be short; every token is in
    * at least one chunk). Scale: tokenize once (own projection —
    * TextFunctions.shinglesOf PERF note), then a narrow
    * posexplode of array slices; no shuffle, chunk ids deterministic,
    * so the downstream embedding join key (doc_id, chunk_idx) is
    * rerun-stable. */
  def chunkDocs(s: SparkSession, dir: String): DataFrame = {
    val chunkArr = expr(
      s"""transform(sequence(0, int(1 + floor((size(toks) - 1) / $ChunkStride)) - 1),
         |  i -> slice(toks, i * $ChunkStride + 1, $ChunkTokens))""".stripMargin)
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(chunkArr).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast(LongType).as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val chunkDocsSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |c AS (SELECT doc_id, toks,
       |             unnest(generate_series(0, CAST(1 + floor((len(toks) - 1) / $ChunkStride) AS INT) - 1)) AS i
       |      FROM t)
       |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       |       CAST(len(list_slice(toks, i * $ChunkStride + 1, i * $ChunkStride + $ChunkTokens)) AS BIGINT) AS n_chunk_tokens,
       |       array_to_string(list_slice(toks, i * $ChunkStride + 1, i * $ChunkStride + $ChunkTokens), ' ') AS chunk_text
       |FROM c
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- q75: BPE pair statistics -----------------------------------

  /** q75 — adjacent-token-pair frequencies: the inner statistic of a
    * BPE/WordPiece merge step (the highest-count adjacent pair is the
    * next merge), over the whole corpus with document frequencies —
    * top 200 pairs. WITH multiplicity (unlike shingles, which dedup),
    * so the pair transform is inline — it still reads the
    * pre-projected token array (TextFunctions.shinglesOf PERF note).
    * Same two-level aggregation discipline as q63's vocabulary:
    * (pair, doc) partial counts, then pair rollup — no Expand, one
    * shuffle each, rank window AFTER the limit so it sees 200 rows,
    * not the pair space. */
  // ---- q107: BPE merge training (iterative) ------------------------

  /** Number of BPE merge rounds the trainer runs. */
  private val BpeMerges = 5

  /** Greedy left-to-right non-overlapping merge of adjacent (a, b)
    * symbol pairs — the BPE apply step. An ordered array fold with a
    * (out, just-merged) struct accumulator: element x merges into the
    * accumulator's last symbol iff that symbol equals `a`, x equals
    * `b`, and the last symbol was not itself produced by this round's
    * merge (the i += 2 of the classic scan — "a a a" under rule (a,a)
    * yields [aa, a], not [aa, aa]). Identical fold in the DuckDB twin
    * (list_reduce with the same struct), so merged vocabularies are
    * bit-identical cross-engine. */
  private def bpeMerge(syms: Column, a: Column, b: Column): Column = {
    val init = struct(
      array().cast("array<string>").as("out"), lit(false).as("lm"))
    aggregate(syms, init, (acc, x) => {
      val out = acc.getField("out")
      val last = when(size(out) > 0, element_at(out, -1))
      when(!acc.getField("lm") && size(out) > 0 && (last === a) && (x === b),
        struct(
          concat(slice(out, lit(1), size(out) - 1), array(concat(a, b))).as("out"),
          lit(true).as("lm")))
        .otherwise(struct(concat(out, array(x)).as("out"), lit(false).as("lm")))
    }).getField("out")
  }

  /** q107 — BPE merge TRAINING, the iterative tokenizer-fit loop (q75
    * counts pairs once; this actually learns merges, Sennrich et al.
    * 2016): word types + frequencies from one corpus pass, words split
    * to characters plus a '</w>' end marker, then BpeMerges rounds of
    * [count adjacent symbol pairs weighted by word freq → argmax pair
    * (total tiebreak: count DESC, then lexicographic) → greedy-merge
    * it into every word]. Output is the learned merge table. The whole
    * loop is ONE lazy plan: each round's argmax is a 1-row TakeOrdered
    * frame crossJoined back (broadcast), so the merge rule reaches the
    * fold as a column — no driver collect, no literal re-planning, and
    * identical exchanges are reused across rounds. Scale: after the
    * initial corpus tokenize+count, every round operates on the WORD-
    * TYPE vocabulary (bounded, freq-weighted) — the corpus is never
    * touched again, which is how a trainer survives 100 TB input. */
  def bpeTrain(s: SparkSession, dir: String): DataFrame =
    bpeFit(s, dir)._1.reduce(_ unionByName _).orderBy(col("merge_rank"))

  /** The shared trainer chain: word types + freqs → BpeMerges rounds of
    * [pair-count → argmax → greedy merge]. Returns the per-round
    * best-merge frames (q107's output) AND the fully-merged word-type
    * encodings `(w, freq, syms)` — the dictionary q115's apply step
    * consumes. The word column rides the fold untouched.
    *
    * Deliberately NOT memoized/persisted (unlike the band/k-means
    * artifacts): a persist boundary breaks whole-stage fusion of the
    * nested fold projection and caches vocab-sized string-array
    * frames — MEASURED at sf0.1: artifact variants cost 9-10 s total
    * vs 4.3 s for q107+q115 each running the lazy chain. Re-evaluate
    * only if a third consumer appears. */
  private def bpeFit(s: SparkSession, dir: String): (Seq[DataFrame], DataFrame) = {
    val words = Tables.t(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    var cur = words.select(col("w"), col("freq"),
      concat(
        transform(sequence(lit(1), length(col("w"))), i => col("w").substr(i, lit(1))),
        array(lit("</w>"))).as("syms"))
    val merges = (1 to BpeMerges).map { r =>
      val n = size(col("syms"))
      val pairCounts = cur
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), n - 1), slice(col("syms"), lit(2), n - 1))).as("p"))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum(col("freq")).as("pair_count"))
      val best = pairCounts
        .orderBy(col("pair_count").desc, col("a"), col("b")).limit(1)
      cur = cur
        .crossJoin(broadcast(best.select(col("a").as("ma"), col("b").as("mb"))))
        .select(col("w"), col("freq"), bpeMerge(col("syms"), col("ma"), col("mb")).as("syms"))
      best.select(lit(r).as("merge_rank"), col("a").as("left_sym"),
        col("b").as("right_sym"), col("pair_count"))
    }
    (merges, cur)
  }

  // ---- q115: BPE encode (tokenizer APPLY) + fertility report --------

  /** q115 — the APPLY half of the tokenizer loop (q107 learns the
    * merges; this encodes the corpus with them) and the report a
    * tokenizer owner actually reads: per-source fertility (subword
    * tokens per whitespace word) and compression (chars per subword) —
    * high fertility on a source/language means its text burns context
    * budget (the multilingual-tokenizer finding of Rust et al. 2021).
    * A bare trailing '</w>' marker is not an emitted token; a marker
    * merged into its word's last subword is (the GPT-2 convention —
    * 'word</w>' is one token). Scale: the merge fold runs ONCE per
    * word TYPE (the dictionary — bounded, freq-weighted), never per
    * occurrence; the corpus pays one token explode into a (source, w)
    * partial agg (map-side combine) and a vocabulary-keyed shuffle
    * join — the word-type table can exceed broadcast size at 100 TB,
    * so it deliberately shuffles on w. Fractions are single IEEE
    * divisions of exact integer sums — bit-identical cross-engine. */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val enc = bpeFit(s, dir)._2.select(col("w"),
      (size(col("syms")) -
        when(element_at(col("syms"), -1) === "</w>", 1).otherwise(0))
        .cast(LongType).as("n_sub"))
    val occ = Tables.t(s, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
    occ.join(enc, "w")
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        count(lit(1)).as("n_word_types"),
        sum(col("cnt") * col("n_sub")).as("n_subword_tokens"),
        sum(col("cnt") * length(col("w")).cast(LongType)).as("n_chars"))
      .select(col("source"), col("n_words"), col("n_word_types"),
        col("n_subword_tokens"),
        (col("n_subword_tokens").cast(DoubleType) /
          col("n_words").cast(DoubleType)).as("fertility"),
        (col("n_chars").cast(DoubleType) /
          col("n_subword_tokens").cast(DoubleType)).as("chars_per_subword"))
      .orderBy(col("source"))
  }

  /** The q107 trainer chain as CTE text (words → w0 → [pc → best →
    * w]* rounds) — shared by the q107 and q115 oracles. DuckDB 1.0
    * list_reduce drops LIST-typed struct fields across steps (a
    * {out: [...], lm: bool} accumulator resets out every element —
    * measured), so the just-merged flag rides as a chr(1) sentinel
    * ELEMENT on a bare VARCHAR[] accumulator instead: a sentinel on
    * top means "the symbol under me was produced by this round's
    * merge — pop me and append without the merge check", which is
    * exactly the Spark fold's lm=true branch. */
  private val bpeCtesSql = {
    val foldSql = (a: String, b: String) =>
      s"""list_filter(
         |  list_reduce(list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, x -> [x])),
         |    (acc, e) -> CASE
         |      WHEN len(acc) > 0 AND acc[-1] = chr(1) THEN list_append(acc[1:-2], e[1])
         |      WHEN len(acc) > 0 AND acc[-1] = $a AND e[1] = $b
         |        THEN list_append(list_append(acc[1:-2], $a || $b), chr(1))
         |      ELSE list_append(acc, e[1]) END),
         |  s -> s <> chr(1))""".stripMargin
    val rounds = (1 to BpeMerges).map { r =>
      s"""pc$r AS (
         |  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(freq) AS BIGINT) AS pair_count
         |  FROM w${r - 1}, unnest(generate_series(1, len(syms) - 1)) AS t(i)
         |  GROUP BY 1, 2),
         |best$r AS (
         |  SELECT a, b, pair_count FROM pc$r
         |  ORDER BY pair_count DESC, a, b LIMIT 1),
         |w$r AS (
         |  SELECT w, freq, ${foldSql(s"best$r.a", s"best$r.b")} AS syms
         |  FROM w${r - 1}, best$r)""".stripMargin
    }.mkString(",\n")
    s"""words AS (
       |  SELECT w, count(1) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY 1),
       |w0 AS (
       |  SELECT w, freq,
       |         list_append(list_transform(generate_series(1, len(w)), i -> w[i:i]), '</w>') AS syms
       |  FROM words),
       |$rounds""".stripMargin
  }

  private val bpeTrainSql = {
    val out = (1 to BpeMerges).map(r =>
      s"SELECT $r AS merge_rank, a AS left_sym, b AS right_sym, pair_count FROM best$r")
      .mkString("\nUNION ALL\n")
    s"""WITH $bpeCtesSql
       |$out
       |ORDER BY merge_rank""".stripMargin
  }

  private val bpeEncodeSql =
    s"""WITH $bpeCtesSql,
       |enc AS (
       |  SELECT w, CAST(len(syms) - CASE WHEN syms[-1] = '</w>' THEN 1 ELSE 0 END AS BIGINT) AS n_sub
       |  FROM w$BpeMerges),
       |occ AS (
       |  SELECT source, w, count(1) AS cnt
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY 1, 2),
       |ag AS (
       |  SELECT source,
       |         CAST(sum(cnt) AS BIGINT) AS n_words,
       |         count(1) AS n_word_types,
       |         CAST(sum(cnt * n_sub) AS BIGINT) AS n_subword_tokens,
       |         CAST(sum(cnt * len(w)) AS BIGINT) AS n_chars
       |  FROM occ JOIN enc USING (w) GROUP BY 1)
       |SELECT source, n_words, n_word_types, n_subword_tokens,
       |       CAST(n_subword_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility,
       |       CAST(n_chars AS DOUBLE) / CAST(n_subword_tokens AS DOUBLE) AS chars_per_subword
       |FROM ag ORDER BY source""".stripMargin

  // ---- q112: rare-bigram LM novelty filter -------------------------

  /** Corpus count at or below which a bigram counts as rare (hapax). */
  private val RareBigramMax = 1L

  /** A doc is flagged when its surprise exceeds this multiple of the
    * corpus mean surprise — data-relative, so the gate transfers
    * across corpora without retuning an absolute cutoff. */
  private val NoveltyMeanMult = 2.0

  /** q112 — LM-based quality filtering, the CCNet stage (Wenzek et
    * al. 2020) without the libm hazard: CCNet scores each doc by
    * KenLM perplexity under a corpus LM; log/exp are libm-
    * implementation-varying, so (same deviation rule as q58's TF-IDF)
    * the score here is the log-free analogue — the doc's MEAN INVERSE
    * corpus frequency of its bigrams (surprise: 1/c per bigram, 1.0
    * for a hapax, →0 for template text), each term snapped before an
    * exact decimal mean. Gibberish and OCR noise score high; template
    * text scores at the corpus floor. The flag is data-relative:
    * surprise > NoveltyMeanMult × the corpus mean surprise (an exact
    * decimal mean — no quantile sort). Scale: the bigram LM is one
    * (bigram) two-level aggregation with map-side combine; the score
    * join is derived-vs-derived on the bigram key (never broadcast —
    * the LM is corpus-sized); the corpus mean is a 1-row broadcast. */
  def lmNovelty(s: SparkSession, dir: String): DataFrame = {
    import graft.util.Parity.snapRound
    val pairArr = expr(
      """CASE WHEN size(toks) >= 2
        |THEN transform(sequence(1, size(toks) - 1),
        |       i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))
        |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)
    val pairs = Tables.t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(pairArr).as("bg"))
    val lm = pairs.groupBy(col("bg")).agg(count(lit(1)).as("c"))
    val scored = pairs.join(lm, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c") <= RareBigramMax, lit(1L)).otherwise(lit(0L))).as("n_rare"),
        snapRound(
          sum(snapRound(lit(1.0) / col("c").cast(DoubleType), 8)
            .cast(DecimalType(38, 10))).cast(DoubleType) / count(lit(1)), 6)
          .as("surprise"))
    val corpusMean = scored.agg(
      snapRound(sum(col("surprise").cast(DecimalType(38, 8))).cast(DoubleType) /
        count(lit(1)), 6).as("mean_surprise"))
    scored.crossJoin(broadcast(corpusMean))
      .select(col("doc_id"), col("n_bigrams"), col("n_rare"), col("surprise"),
        (col("surprise") > col("mean_surprise") * NoveltyMeanMult).as("is_novel"))
      .orderBy(col("doc_id"))
  }

  private val lmNoveltySql = {
    import graft.util.Parity.snapRoundSql
    val term = snapRoundSql("1.0 / CAST(c AS DOUBLE)", 8)
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |p AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
       |        THEN list_transform(generate_series(1, len(toks) - 1),
       |               i -> toks[i] || ' ' || toks[i+1])
       |        ELSE [] END) AS bg
       |      FROM t),
       |lm AS (SELECT bg, count(1) AS c FROM p GROUP BY 1),
       |sc AS (
       |  SELECT doc_id, count(1) AS n_bigrams,
       |         CAST(sum(CASE WHEN c <= $RareBigramMax THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       |         ${snapRoundSql(
              s"CAST(sum(CAST($term AS DECIMAL(38,10))) AS DOUBLE) / count(1)", 6)} AS surprise
       |  FROM p JOIN lm USING (bg) GROUP BY 1),
       |cm AS (
       |  SELECT ${snapRoundSql(
              "CAST(sum(CAST(surprise AS DECIMAL(38,8))) AS DOUBLE) / count(1)", 6)} AS mean_surprise
       |  FROM sc)
       |SELECT doc_id, n_bigrams, n_rare, surprise,
       |       surprise > mean_surprise * $NoveltyMeanMult AS is_novel
       |FROM sc, cm ORDER BY doc_id""".stripMargin
  }

  def bpePairs(s: SparkSession, dir: String): DataFrame = {
    val pairArr = expr(
      """CASE WHEN size(toks) >= 2
        |THEN transform(sequence(1, size(toks) - 1),
        |       i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))
        |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)
    val perDoc = Tables.t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(pairArr).as("pair"))
      .groupBy(col("pair"), col("doc_id")).agg(count(lit(1)).as("cnt"))
    val top = perDoc.groupBy(col("pair"))
      .agg(sum(col("cnt")).as("occurrences"), count(lit(1)).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("pair"))
      .limit(200)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("occurrences").desc, col("pair"))))
      .select(col("rank"), col("pair"), col("occurrences"), col("doc_freq"))
      .orderBy(col("rank"))
  }

  private val bpePairsSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |p AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
      |        THEN list_transform(generate_series(1, len(toks) - 1),
      |               i -> toks[i] || ' ' || toks[i+1])
      |        ELSE [] END) AS pair
      |      FROM t),
      |perdoc AS (SELECT pair, doc_id, count(1) AS cnt FROM p GROUP BY 1, 2),
      |top AS (
      |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS occurrences, count(1) AS doc_freq
      |  FROM perdoc GROUP BY 1
      |  ORDER BY occurrences DESC, pair LIMIT 200)
      |SELECT CAST(row_number() OVER (ORDER BY occurrences DESC, pair) AS INTEGER) AS rank,
      |       pair, occurrences, doc_freq
      |FROM top
      |ORDER BY rank""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_repetition_profile" -> repetitionProfile,
    "q62_decontamination" -> decontaminate,
    "q91_decon_two_phase" -> decontaminateTwoPhase,
    "q99_curation_funnel" -> curationFunnel,
    "q63_vocabulary" -> vocabulary,
    "q138_zipf_slope" -> zipfSlope,
    "q147_heaps_law" -> heapsLaw,
    "q139_source_jsd" -> sourceJsd,
    "q141_dsir_weights" -> dsirWeights,
    "q142_pack_chunks" -> packChunks,
    "q143_lr_quality" -> lrQuality,
    "q145_data_budget" -> dataBudgetPlan,
    "q151_unimax_alloc" -> unimaxAlloc,
    "q152_span_excision" -> spanExcision,
    "q158_line_clean" -> lineClean,
    "q160_gopher_repetition" -> gopherRepetition,
    "q161_lexical_diversity" -> lexicalDiversity,
    "q146_training_manifest" -> trainingManifest,
    "q92_oov_profile" -> oovProfile,
    "q65_lang_source_matrix" -> langSourceMatrix,
    "q67_pii_redact" -> piiRedact,
    "q68_corpus_mix" -> corpusMix,
    "q106_temperature_mix" -> temperatureMix,
    "q107_bpe_train" -> bpeTrain,
    "q115_bpe_encode" -> bpeEncode,
    "q110_signal_agreement" -> signalAgreement,
    "q112_lm_novelty" -> lmNovelty,
    "q69_span_dedup" -> spanDedup,
    "q72_chunk_docs" -> chunkDocs,
    "q75_bpe_pairs" -> bpePairs,
    "q84_cms_heavy_hitters" -> cmsHeavyHitters)

  override def oracles: Map[String, String] = Map(
    "q61_repetition_profile" -> repetitionProfileSql,
    "q62_decontamination" -> decontaminateSql,
    "q91_decon_two_phase" -> decontaminateSql,
    "q99_curation_funnel" -> curationFunnelSql,
    "q63_vocabulary" -> vocabularySql,
    "q138_zipf_slope" -> zipfSlopeSql,
    "q147_heaps_law" -> heapsLawSql,
    "q139_source_jsd" -> sourceJsdSql,
    "q141_dsir_weights" -> dsirWeightsSql,
    "q142_pack_chunks" -> packChunksSql,
    "q143_lr_quality" -> lrQualitySql,
    "q145_data_budget" -> dataBudgetPlanSql,
    "q151_unimax_alloc" -> unimaxAllocSql,
    "q152_span_excision" -> spanExcisionSql,
    "q158_line_clean" -> lineCleanSql,
    "q160_gopher_repetition" -> gopherRepetitionSql,
    "q161_lexical_diversity" -> lexicalDiversitySql,
    "q146_training_manifest" -> trainingManifestSql,
    "q92_oov_profile" -> oovProfileSql,
    "q65_lang_source_matrix" -> langSourceMatrixSql,
    "q67_pii_redact" -> piiRedactSql,
    "q68_corpus_mix" -> corpusMixSql,
    "q106_temperature_mix" -> temperatureMixSql,
    "q107_bpe_train" -> bpeTrainSql,
    "q115_bpe_encode" -> bpeEncodeSql,
    "q110_signal_agreement" -> signalAgreementSql,
    "q112_lm_novelty" -> lmNoveltySql,
    "q69_span_dedup" -> spanDedupSql,
    "q72_chunk_docs" -> chunkDocsSql,
    "q75_bpe_pairs" -> bpePairsSql,
    "q84_cms_heavy_hitters" -> cmsHeavyHittersSql)
}
