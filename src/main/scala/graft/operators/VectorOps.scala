package graft.operators

import graft.{QueryModule, Tables}
import graft.util.Parity._
import graft.plans.DotProduct.dot_product
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: array<float>, label).
  *
  * Shape: the query side (fixed small set) broadcasts against the
  * collection; dot products are array-local `zip_with` folds — one
  * narrow pass per (query, candidate) pair, no per-dimension shuffle.
  * Top-k is a per-query rank window. Three search modes: q30
  * brute-force (correctness baseline), q31 attribute-filtered (label
  * predicate — a tenant/category constraint), q43 true IVF (sampled
  * coarse quantizer + cell-restricted search — the geometric scale
  * path). At real scale the broadcast side is the query batch
  * (bounded), the collection streams — exactly these plans.
  *
  * Determinism: per-element products stay double (IEEE-identical in
  * both engines) and every reduction is an ORDERED left fold over the
  * array (DuckDB: `list_reduce`) — the same sequence of binary64 adds
  * on both sides is bit-identical, so cosines match the oracle and
  * rank windows can never disagree. (Unordered SUMs would need
  * decimal accumulators; array folds don't, and the double fold is
  * ~100× cheaper than BigDecimal per element.) Dot products run
  * through the native codegen'd `graft.plans.DotProduct` expression —
  * the identical index-order fold as `aggregate(zip_with(...))`, with
  * no intermediate arrays; SRP projections use it too, against
  * plan-time-constant hyperplane arrays (srpPlane — the weight mixer
  * runs at plan build, never per row).
  */
object VectorOps extends QueryModule {

  private val N_QUERIES = 20

  /** Embedding dimensionality of the fixtures (declared before every
    * val that interpolates it into oracle SQL — object-init order). */
  private val DIM = 64

  /** Σ x_i as an ordered binary64 left fold — bit-identical to the
    * oracle's `list_reduce(list_prepend(0.0, …), +)`. */
  private def dSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** SQL twin of dSum ∘ zip_with(·,·,*): ordered double dot product. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip($a, $b), " +
      "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"

  private def withNorm(df: DataFrame): DataFrame = {
    val xs = transform(col("embedding"), x => x.cast(DoubleType))
    df.select(col("vec_id"), col("label"), xs.as("e"))
      .withColumn("norm2", dot_product(col("e"), col("e")))
  }

  private def topk(s: SparkSession, dir: String, sameCluster: Boolean, k: Int,
      queryLo: Long = 0L): DataFrame = {
    val all = withNorm(Tables.t(s, dir, "embeddings"))
    val q = all.filter(col("vec_id") >= queryLo &&
      col("vec_id") < queryLo + N_QUERIES)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("e").as("qe"), col("norm2").as("qnorm2"))
    val c = all.select(col("vec_id").as("cid"), col("label").as("clabel"),
      col("e").as("ce"), col("norm2").as("cnorm2"))
    val cond = (col("qid") !== col("cid")) &&
      (if (sameCluster) col("qlabel") === col("clabel") else lit(true))
    val dot = dot_product(col("qe"), col("ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col("cid"))
    c.join(broadcast(q), cond) // bounded query batch broadcasts; collection streams
      .select(col("qid"), col("cid"),
        (dot / (sqrt(col("qnorm2")) * sqrt(col("cnorm2")))).as("cosine_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("cid").as("neighbor_id"), snapRound(col("cosine_raw"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q30 — brute-force cosine top-k: every query vector against the
    * full collection. The correctness baseline for ANN. */
  def cosineTopk(s: SparkSession, dir: String): DataFrame =
    topk(s, dir, sameCluster = false, k = 5)

  /** q31 — attribute-filtered ANN: search restricted to the query's
    * metadata partition (label). This is FILTERED vector search (a
    * tenant/category constraint), not a geometric quantizer — the
    * labels are class labels, not spatial cells (ScaleSpec measured
    * only 37% label-centroid agreement). The geometric variant is
    * q43. */
  def annFiltered(s: SparkSession, dir: String): DataFrame =
    topk(s, dir, sameCluster = true, k = 3)

  private val N_CELLS = 8

  /** q43 — true IVF: a sampled coarse quantizer (the first N_CELLS
    * vectors are the centroids), one assignment pass (argmax cosine,
    * deterministic tiebreak), then top-k search restricted to the
    * query's cell. Probe = 1; recall vs q30 is measured in
    * VectorRecallSpec. At scale: assignment is a broadcast of
    * N_CELLS centroids against the streaming collection; search
    * shuffles once on cell id. */
  def annIvfSampled(s: SparkSession, dir: String): DataFrame =
    annIvf(s, dir, probe = 1)

  /** q52 — multi-probe IVF: the query side searches its `probe`
    * NEAREST cells instead of only the best one. Collection vectors
    * stay single-cell (the inverted file); only the query fans out —
    * the standard recall/latency dial (probe=2 of 8 cells ≈ 2× the
    * scanned fraction). Measured in VectorRecallSpec: recall@probe=2
    * strictly above probe=1. */
  def annIvfProbe2(s: SparkSession, dir: String): DataFrame =
    annIvf(s, dir, probe = 2)

  /** q80 — the production recall point: 32 cells × probe 4. The
    * recall dial has TWO axes and the cell count is the stronger one —
    * finer cells localize true neighbors better at the same scanned
    * fraction (RecallCurve, fixture, recall@1 / scanned-fraction:
    * 8 cells probe 1 → 0.55-0.65 / 0.13; 32 cells probe 2 →
    * 0.95-1.00 / 0.06; 32 cells probe 4 → 0.95-1.00 / 0.125). This
    * config holds recall@1 ≥ 0.9 at every fixture SF while scanning
    * ~1/8 of the collection (ScaleSpec asserts both). Candidates are
    * exact-cosine ranked (the re-rank is inherent: within probed
    * cells the search IS exact), so precision loss comes only from
    * cell misses. */
  def annIvfProbe4(s: SparkSession, dir: String): DataFrame =
    annIvf(s, dir, probe = 4, cells = 32)

  /** Centroid-similarity scoring of a (vec_id, e, norm2) frame against
    * the first-`cells` sampled centroids: (vec_id, e, norm2,
    * centroid_id, csim) — the shared probe core. */
  private def ivfScored(s: SparkSession, dir: String, cells: Int,
      onlyQueries: Boolean, queryLo: Long = 0L): DataFrame = {
    val all0 = withNorm(Tables.t(s, dir, "embeddings"))
    val cents = all0.filter(col("vec_id") < cells)
      .select(col("vec_id").as("centroid_id"), col("e").as("ce"), col("norm2").as("cnorm2"))
    val all = if (onlyQueries) all0.filter(col("vec_id") >= queryLo &&
      col("vec_id") < queryLo + N_QUERIES) else all0
    val sim = (dot_product(col("e"), col("ce"))
      / (sqrt(col("norm2")) * sqrt(col("cnorm2")))).as("csim")
    all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("e"), col("norm2"), col("centroid_id"), sim)
  }

  /** The inverted file: every vector's ONE nearest cell (argmax cosine,
    * ties to the smallest centroid_id — the historical window-rank-1
    * rule). max_by, NOT a rank window: the window shape shuffled the
    * full N×cells fan-out (64M rows at the 10× witness scale — an OOM,
    * the kmAssign lesson re-learned), while the aggregate collapses
    * K→1 map-side and shuffles N rows. */
  private[graft] def ivfFile(s: SparkSession, dir: String, cells: Int): DataFrame =
    ivfScored(s, dir, cells, onlyQueries = false)
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("e"), col("norm2"), col("centroid_id")),
        struct(col("csim"), (-col("centroid_id")).as("negc"))).as("b"))
      .select(col("vec_id"), col("b.e").as("e"), col("b.norm2").as("norm2"),
        col("b.centroid_id").as("cell"))

  /** Ranked cells for the QUERY batch only (vec_id < N_QUERIES): the
    * multi-probe fan-out needs a rank, but only over batch×cells rows
    * — never the whole collection. */
  private[graft] def ivfQueryProbes(s: SparkSession, dir: String, cells: Int,
      queryLo: Long = 0L): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("centroid_id"))
    ivfScored(s, dir, cells, onlyQueries = true, queryLo = queryLo)
      .withColumn("rn", row_number().over(w))
  }

  private[graft] def annIvf(s: SparkSession, dir: String, probe: Int,
      cells: Int = N_CELLS, queryLo: Long = 0L): DataFrame = {
    val assigned = ivfFile(s, dir, cells)
    // query side probes its `probe` nearest cells
    val q = ivfQueryProbes(s, dir, cells, queryLo).filter(col("rn") <= probe)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("norm2").as("qnorm2"), col("centroid_id").as("qcell"))
    val c = assigned.select(col("vec_id").as("cid"), col("e").as("ce2"),
      col("norm2").as("cnorm22"), col("cell").as("ccell"))
    val dot = dot_product(col("qe"), col("ce2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col("cid"))
    c.join(broadcast(q), (col("qcell") === col("ccell")) && (col("qid") !== col("cid")))
      .select(col("qid"), col("cid"),
        (dot / (sqrt(col("qnorm2")) * sqrt(col("cnorm22")))).as("cosine_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid").as("query_id"), col("rank"),
        col("cid").as("neighbor_id"), snapRound(col("cosine_raw"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  private def annIvfSql(probe: Int, cells: Int = N_CELLS): String =
    s"""WITH n AS (
       |  SELECT vec_id, ${dotSql("embedding", "embedding")} AS norm2 FROM embeddings),
       |csim AS (
       |  SELECT v.vec_id, c.vec_id AS centroid_id,
       |         ${dotSql("v.embedding", "c.embedding")}
       |           / (sqrt(vn.norm2) * sqrt(cn.norm2)) AS csim
       |  FROM embeddings v JOIN embeddings c ON c.vec_id < $cells
       |  JOIN n vn ON v.vec_id = vn.vec_id
       |  JOIN n cn ON c.vec_id = cn.vec_id),
       |rankedcells AS (
       |  SELECT vec_id, centroid_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) AS rn
       |  FROM csim),
       |assigned AS (
       |  SELECT vec_id, centroid_id AS cell FROM rankedcells WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id, centroid_id AS cell FROM rankedcells
       |  WHERE vec_id < $N_QUERIES AND rn <= $probe),
       |dots AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |         ${dotSql("q.embedding", "c.embedding")} AS dot
       |  FROM qprobe qa
       |  JOIN assigned ca ON qa.cell = ca.cell AND qa.vec_id <> ca.vec_id
       |  JOIN embeddings q ON q.vec_id = qa.vec_id
       |  JOIN embeddings c ON c.vec_id = ca.vec_id),
       |ranked AS (
       |  SELECT qid, cid, dot / (sqrt(qn.norm2) * sqrt(cn.norm2)) AS cosine_raw,
       |         row_number() OVER (PARTITION BY qid ORDER BY dot / (sqrt(qn.norm2) * sqrt(cn.norm2)) DESC, cid) AS rank
       |  FROM dots
       |  JOIN n qn ON qid = qn.vec_id
       |  JOIN n cn ON cid = cn.vec_id)
       |SELECT qid AS query_id, rank, cid AS neighbor_id,
       |       ${snapRoundSql("cosine_raw", 6)} AS cosine
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  // ---- q157: measured ANN recall report ------------------------------

  /** The IVF configurations the recall report measures (the q43/q52/
    * q80 dial points). */
  private val RecallConfigs: Seq[(String, Int, Int)] = Seq(
    ("cells08_probe1", 1, N_CELLS),
    ("cells08_probe2", 2, N_CELLS),
    ("cells32_probe4", 4, 32))

  /** q157 — the ANN recall dial MEASURED as a first-class query: for
    * each IVF configuration, recall@3 of the approximate neighbors
    * against the exact brute-force top-3 (q30's truth), reported as
    * mean and worst-query recall over the query batch — the number an
    * index operator actually watches when trading scanned fraction for
    * quality (RecallCurve plots this offline; q114/retrainIfStale act
    * on its decay; THIS makes the measurement itself oracle-verified).
    * Composition of already-verified operators: the exact side is the
    * q30 plan at k=3, each approximate side is the q43/q52/q80 annIvf
    * plan — one shared definition per engine, so the report can't
    * drift from the queries it audits. Parity: hit counts are exact
    * integers from id-equality joins; per-query recall is one IEEE
    * division snapped 6-dp; the mean folds through an exact decimal
    * sum. Scale: the joins are on (query_id, neighbor_id) over
    * batch×k rows — the report costs the component searches plus
    * nothing. */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = topk(s, dir, sameCluster = false, k = 3)
      .select(col("query_id"), col("neighbor_id"))
    RecallConfigs.map { case (name, probe, cells) =>
      val approx = annIvf(s, dir, probe, cells)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"),
          count(lit(1)).as("n_exact"))
        .select(col("query_id"), snapRound(
          col("n_hit").cast(DoubleType) / col("n_exact").cast(DoubleType), 6)
          .as("recall"))
        .agg(count(lit(1)).as("n_queries"),
          snapRound(sum(col("recall").cast(DecimalType(38, 10)))
            .cast(DoubleType) / count(lit(1)), 6).as("mean_recall"),
          snapRound(min(col("recall")), 6).as("min_recall"))
        .select(lit(name).as("config"), lit(3L).as("k"), col("n_queries"),
          col("mean_recall"), col("min_recall"))
    }.reduce(_ unionByName _).orderBy(col("config"))
  }

  /** One IVF configuration's (recall@1, recall@3, scanned fraction)
    * against the brute-force truth over any dir — the ScalingWitness
    * seam (q157 pins the oracle-verified report at the fixture scale;
    * this measures the same numbers at witness scales with the K ∝ N
    * cell dial). Id-equality hits like q157; scanned fraction is the
    * mean share of the collection inside the queries' probed cells. */
  /** `queryLo` shifts the 20-query batch away from vec_id 0 — REQUIRED
    * for any honest recall dial with cells ≥ N_QUERIES: the sampled
    * centroids are the first `cells` vectors, so the default query
    * batch would consist of the centroids themselves (own cell probed
    * first at csim=1, the NN almost surely inside it) and recall
    * saturates at 1.00 no matter the data — the r13 witness artifact's
    * flaw. Oracle-pinned queries keep queryLo=0 (byte-identical). */
  private[graft] def recallAt(s: SparkSession, dir: String, probe: Int,
      cells: Int, queryLo: Long = 0L): (Double, Double, Double) = {
    val exact = topk(s, dir, sameCluster = false, k = 3, queryLo)
      .select(col("query_id"), col("rank"), col("neighbor_id")).persist()
    val approx = annIvf(s, dir, probe, cells, queryLo)
      .select(col("query_id"), col("rank"), col("neighbor_id")).persist()
    def recallK(k: Int): Double = {
      val hits = exact.filter(col("rank") <= k)
        .join(approx.filter(col("rank") <= k).withColumn("hit", lit(1L))
          .select(col("query_id"), col("neighbor_id"), col("hit")),
          Seq("query_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))), count(lit(1))).head()
      hits.getLong(0).toDouble / hits.getLong(1)
    }
    val (r1, r3) = (recallK(1), recallK(3))
    val sizes = ivfFile(s, dir, cells)
      .groupBy(col("cell")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = sizes.values.sum.toDouble
    val probed = ivfQueryProbes(s, dir, cells, queryLo).filter(col("rn") <= probe)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nq = probed.map(_._1).distinct.size
    val scanned = probed.groupBy(_._1).values
      .map(_.map(p => sizes.getOrElse(p._2, 0L)).sum).sum.toDouble / (nq * total)
    exact.unpersist(); approx.unpersist()
    (r1, r3, scanned)
  }

  private lazy val annRecallSql = {
    val blocks = RecallConfigs.map { case (name, probe, cells) =>
      s"""h_$name AS (
         |  SELECT e.query_id,
         |         CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
         |         count(1) AS n_exact
         |  FROM ex e LEFT JOIN (${annIvfSql(probe, cells)}) a
         |    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |  GROUP BY 1),
         |s_$name AS (
         |  SELECT query_id,
         |         ${snapRoundSql("CAST(n_hit AS DOUBLE) / CAST(n_exact AS DOUBLE)", 6)} AS recall
         |  FROM h_$name),
         |g_$name AS (
         |  SELECT '$name' AS config, CAST(3 AS BIGINT) AS k, count(1) AS n_queries,
         |         ${snapRoundSql(
        "CAST(sum(CAST(recall AS DECIMAL(38,10))) AS DOUBLE) / count(1)", 6)} AS mean_recall,
         |         ${snapRoundSql("min(recall)", 6)} AS min_recall
         |  FROM s_$name)""".stripMargin
    }.mkString(",\n")
    val union = RecallConfigs.map { case (name, _, _) => s"SELECT * FROM g_$name" }
      .mkString("\nUNION ALL\n")
    s"""WITH ex AS (${topkSql(sameCluster = false, k = 3)}),
       |$blocks
       |$union
       |ORDER BY config""".stripMargin
  }

  private def topkSql(sameCluster: Boolean, k: Int): String = {
    val clusterPred = if (sameCluster) "AND q.label = c.label" else ""
    s"""WITH n AS (
       |  SELECT vec_id, ${dotSql("embedding", "embedding")} AS norm2 FROM embeddings),
       |dots AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |         ${dotSql("q.embedding", "c.embedding")} AS dot
       |  FROM embeddings q
       |  JOIN embeddings c ON q.vec_id <> c.vec_id $clusterPred
       |  WHERE q.vec_id < $N_QUERIES),
       |ranked AS (
       |  SELECT qid, cid, dot / (sqrt(qn.norm2) * sqrt(cn.norm2)) AS cosine_raw,
       |         row_number() OVER (PARTITION BY qid ORDER BY dot / (sqrt(qn.norm2) * sqrt(cn.norm2)) DESC, cid) AS rank
       |  FROM dots
       |  JOIN n qn ON qid = qn.vec_id
       |  JOIN n cn ON cid = cn.vec_id)
       |SELECT qid AS query_id, rank, cid AS neighbor_id,
       |       ${snapRoundSql("cosine_raw", 6)} AS cosine
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- q87: scalar-quantized (SQ8) ANN -----------------------------

  /** Per-dimension quantization range: a 1-row (los, his) frame in
    * position order from one two-level aggregation (pos-keyed partial
    * agg — the corpus never collects). */
  private def sq8Params(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")
      .select(posexplode(transform(col("embedding"), x => x.cast(DoubleType))).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .agg(
        array_sort(collect_list(struct(col("pos"), col("lo")))).as("plo"),
        array_sort(collect_list(struct(col("pos"), col("hi")))).as("phi"))
      .select(
        transform(col("plo"), t => t.getField("lo")).as("los"),
        transform(col("phi"), t => t.getField("hi")).as("phi_hi"))
      .withColumnRenamed("phi_hi", "his")

  /** q87 — compression-aware ANN via 8-bit scalar quantization (the
    * FAISS SQ8 design): each dimension maps to a 256-level uniform
    * grid over its observed [lo, hi], so a collection vector stores 64
    * BYTES instead of 64 floats (4× memory — at 100 TB the index-fits-
    * in-RAM dial), and search scores the EXACT query against
    * dequantized cell midpoints (asymmetric distance). Ranking matches
    * q30's exact cosine ordering almost always — ScaleSpec measures
    * recall@1 against the brute-force baseline.
    *
    * Scale: the range agg is two-level; encode/dequantize are narrow
    * maps; search is the q30 shape (bounded query batch broadcast,
    * collection streams — never all-pairs materialized). */
  def annSq8(s: SparkSession, dir: String): DataFrame = {
    val params = sq8Params(s, dir)
    val all = withNorm(Tables.t(s, dir, "embeddings"))
    val enc = all.crossJoin(broadcast(params))
    // code_d = clamp(floor((x−lo)/(hi−lo) · 256)) ∈ [0, 255] — one
    // byte; constant dimensions (hi = lo) encode as 0
    val codes = transform(arrays_zip(col("e"), col("los"), col("his")), t => {
      val w = t.getField("his") - t.getField("los")
      val u = when(w === lit(0.0), lit(0.0))
        .otherwise((t.getField("e") - t.getField("los")) / w)
      least(greatest(floor(u * lit(256.0)), lit(0.0)), lit(255.0))
    })
    val coll = enc.select(col("vec_id").as("cid"), col("los"), col("his"), codes.as("codes"))
      .withColumn("xq", transform(arrays_zip(col("codes"), col("los"), col("his")), t =>
        t.getField("los") + (t.getField("codes") + lit(0.5)) / lit(256.0) *
          (t.getField("his") - t.getField("los"))))
      .select(col("cid"), col("xq"))
      .withColumn("xqnorm2", dot_product(col("xq"), col("xq")))
    val q = all.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("norm2").as("qnorm2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col("cid"))
    coll.join(broadcast(q), col("qid") !== col("cid"))
      .select(col("qid"), col("cid"),
        (dot_product(col("qe"), col("xq")) /
          (sqrt(col("qnorm2")) * sqrt(col("xqnorm2")))).as("cosine_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid").as("query_id"), col("rank"), col("cid").as("neighbor_id"),
        snapRound(col("cosine_raw"), 6).as("cosine_sq8"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val annSq8Sql = {
    // indexed lambda over the PHYSICAL embedding list, not
    // list_transform(generate_series(...), ...): DuckDB 1.0 loses
    // generate_series-built lists across CTE boundaries (len() = 0
    // one CTE later), while lists derived from a stored column
    // propagate fine
    val dequant =
      s"""p.los[i] + (least(greatest(floor(
         |  CASE WHEN p.his[i] - p.los[i] = 0 THEN 0.0
         |       ELSE (CAST(x AS DOUBLE) - p.los[i]) / (p.his[i] - p.los[i]) END
         |  * 256.0), 0.0), 255.0) + 0.5) / 256.0 * (p.his[i] - p.los[i])""".stripMargin
    s"""WITH binned AS (
       |  SELECT t.pos, min(CAST(embedding[t.pos] AS DOUBLE)) AS lo,
       |         max(CAST(embedding[t.pos] AS DOUBLE)) AS hi
       |  FROM embeddings, (SELECT unnest(generate_series(1, $DIM)) AS pos) t
       |  GROUP BY 1),
       |params AS (SELECT list(lo ORDER BY pos) AS los, list(hi ORDER BY pos) AS his FROM binned),
       |xq AS (
       |  SELECT e.vec_id AS cid,
       |         list_transform(e.embedding, (x, i) -> $dequant) AS xqe
       |  FROM embeddings e, params p),
       |xn AS (SELECT cid, ${dotSql("xqe", "xqe")} AS xqnorm2 FROM xq),
       |qn AS (SELECT vec_id, ${dotSql("embedding", "embedding")} AS norm2
       |       FROM embeddings WHERE vec_id < $N_QUERIES),
       |dots AS (
       |  SELECT q.vec_id AS qid, x.cid, ${dotSql("q.embedding", "x.xqe")} AS dot
       |  FROM embeddings q JOIN xq x ON q.vec_id <> x.cid
       |  WHERE q.vec_id < $N_QUERIES),
       |ranked AS (
       |  SELECT qid, dots.cid, dot / (sqrt(qn.norm2) * sqrt(xn.xqnorm2)) AS cosine_raw,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY dot / (sqrt(qn.norm2) * sqrt(xn.xqnorm2)) DESC, dots.cid) AS rank
       |  FROM dots
       |  JOIN qn ON qid = qn.vec_id
       |  JOIN xn ON dots.cid = xn.cid)
       |SELECT qid AS query_id, rank, cid AS neighbor_id,
       |       ${snapRoundSql("cosine_raw", 6)} AS cosine_sq8
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- q51: embedding-cosine near-dup via sign-projection LSH ------

  private val SRP_BITS = 96  // hyperplanes
  private val SRP_ROWS = 16  // bits per band -> 6 bands, 65536 buckets each

  /** Deterministic ±1 hyperplane weight for (hyperplane h, dim i):
    * a lowbias32-style multiply/xor-shift mix of the flattened index,
    * bit 15 picks the sign. Pure integer arithmetic with every
    * intermediate < 2^59 — bit-identical in both engines, no ANSI /
    * BIGINT overflow (no transcendentals, which ARE allowed to differ
    * across libm implementations).
    *
    * Why a full mixer and not one LCG step: bit 16 of `a·k+b` over a
    * stride-64 arithmetic progression is heavily self-correlated —
    * the 96 hyperplane rows it generated had mean |pairwise corr|
    * 0.495 (some rows identical), collapsing distinct cluster
    * directions onto shared band values. ScaleSpec's candidate-growth
    * fixture exploded quadratically on exactly that; with this mixer
    * the rows measure |corr| ≈ 0.10, matching true random signs. */
  private def srpWeight(h: Int, i: Int): Double = {
    val mask = 0xffffffffL
    val k = h.toLong * DIM + i
    val x0 = (k * 2654435761L) & mask
    val x1 = ((x0 ^ (x0 >>> 16)) * 73244475L) & mask
    val x2 = ((x1 ^ (x1 >>> 16)) * 73244475L) & mask
    val x3 = x2 ^ (x2 >>> 16)
    if (((x3 >>> 15) & 1L) == 0L) 1.0 else -1.0
  }

  /** Hyperplane h as a plan-time literal array: the weights depend
    * only on (h, i), so the mixer runs 96×64 times at PLAN BUILD, not
    * per row — each bit is then one codegen'd dot_product against a
    * constant array instead of a per-element lambda evaluating the
    * 4-step mixer (~10 integer ops + branch) for every row. Ordered
    * fold semantics are identical (DotProduct IS the composed fold;
    * weights are exact ±1.0), so signatures — and the DuckDB oracle,
    * which keeps the mixer expanded inline — are bit-unchanged. */
  private def srpPlane(h: Int): Column =
    array((0 until DIM).map(i => lit(srpWeight(h, i))): _*)

  /** Session-lifetime SRP band artifact per data dir — the stored
    * `embedding_signatures` table a deployment writes once and shares
    * (same artifact design as TextOps' minhash bands). */
  private val srpBandCache =
    collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def srpBands(s: SparkSession, dir: String): DataFrame =
    srpBandCache.synchronized { srpBandCache.getOrElseUpdate((s, dir), {
      val bands = srpBandsOver(Tables.t(s, dir, "embeddings")).persist()
      bands.count()
      bands
    }) }

  /** The SRP banding chain over an arbitrary (vec_id, embedding)
    * frame — the seam ScaleSpec uses to measure candidate-pair growth
    * on synthetic embedding sets of controlled size. `rowsPerBand`
    * (default: the q51 production constant) is the bucket-count dial:
    * 2^rows buckets per band, so at n vectors the expected birthday
    * cross-collisions per band are ~n²/2^(rows+1) — the scale path
    * grows rows with log₂ n to hold that linear (the ScalingWitness
    * measures both the fixed and the widened setting at 10×). Must
    * divide SRP_BITS. */
  private[graft] def srpBandsOver(emb: DataFrame,
      rowsPerBand: Int = SRP_ROWS): DataFrame = {
    require(SRP_BITS % rowsPerBand == 0, s"rowsPerBand must divide $SRP_BITS")
    val all = withNorm(emb)
    val bits = (0 until SRP_BITS).map { h =>
      (dot_product(col("e"), srpPlane(h)) >= 0)
        .cast(IntegerType).as(s"bit$h")
    }
    val sig = all.select(col("vec_id") +: col("e") +: col("norm2") +: bits: _*)
    (0 until SRP_BITS / rowsPerBand).map { b =>
      val bandVal = (0 until rowsPerBand).map(j =>
        col(s"bit${b * rowsPerBand + j}").cast(LongType) * lit(1L << (rowsPerBand - 1 - j))).reduce(_ + _)
      sig.select(col("vec_id"), lit(b).as("band"), bandVal.as("band_val"))
    }.reduce(_.unionByName(_))
  }

  /** Candidate pairs of a band frame (bucket join, never all-pairs). */
  private[graft] def srpCandidatesOver(bands: DataFrame): DataFrame =
    bands.alias("a").join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()

  /** Build the shared artifact eagerly (Bench prepare phase). */
  def prepareArtifacts(s: SparkSession, dir: String): Unit = srpBands(s, dir)

  /** Bench prep-hash probes: prep_srp_bands and prep_kmeans frames. */
  private[graft] def prepProbe(s: SparkSession, dir: String): Seq[DataFrame] =
    Seq(srpBands(s, dir))
  private[graft] def kmeansProbe(s: SparkSession, dir: String): Seq[DataFrame] = {
    val (idxAssign, idxCents) = storedIndexFit(s, dir)
    // the assignment frames carry the embedding column itself — hash
    // the decision columns (id, cell) instead of re-serializing vectors
    Seq(kmeansAssignment(s, dir).select(col("vec_id"), col("cell"), col("csim")),
      docKmeansAssignment(s, dir).select(col("vec_id"), col("cell"), col("csim")),
      idxAssign.select(col("vec_id"), col("cell"), col("csim")),
      idxCents.select(col("cell"), col("cnorm2")))
  }

  /** q51 — embedding-cosine near-duplicate detection at collection
    * scale (every vector vs every vector — dedup, not query search):
    * 96 sign-projection bits per vector (narrow map), banded 6×16 so
    * candidates come from 65536-way bucket joins, exact ordered-fold
    * cosine ONLY on candidates, near-dup flag at 0.95. Band sizing:
    * at cosine 0.95 per-bit agreement is 1−θ/π ≈ 0.899, so a 16-bit
    * band collides with p ≈ 0.18 and 6 bands give ≈ 0.70 recall —
    * while merely-similar pairs (cos 0.7 → per-bit 0.75) collide at
    * ≈ 0.9% per band, so candidates stay near-linear. A previous 2×8
    * design had only 256 buckets per band — a CONSTANT, so candidate
    * pairs grew O(N²/256) on clustered data; 16-bit bands defer that
    * wall by 256× at both better recall and lower cost. The SRP-LSH
    * analogue of q22's minhash banding — the standard shape that
    * survives 100 TB of embeddings (never all-pairs). */
  def cosineNearDup(s: SparkSession, dir: String): DataFrame =
    cosineCandidates(s, dir)
      .select(col("vec_a"), col("vec_b"),
        snapRound(col("cosine_raw"), 6).as("cosine"),
        (col("cosine_raw") >= 0.95).as("is_near_dup"))
      .orderBy(col("vec_a"), col("vec_b"))

  /** SRP candidate pairs with their exact ordered-fold cosine — the
    * shared core of q51 (report) and q73 (clustering). */
  private def cosineCandidates(s: SparkSession, dir: String): DataFrame = {
    val all = withNorm(Tables.t(s, dir, "embeddings"))
    val pairs = srpCandidatesOver(srpBands(s, dir))
    val ea = all.select(col("vec_id").as("vec_a"), col("e").as("ea"), col("norm2").as("na"))
    val eb = all.select(col("vec_id").as("vec_b"), col("e").as("eb"), col("norm2").as("nb"))
    val dot = dot_product(col("ea"), col("eb"))
    pairs.join(ea, "vec_a").join(eb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        (dot / (sqrt(col("na")) * sqrt(col("nb")))).as("cosine_raw"))
  }

  /** q73 — embedding near-dup CLUSTERS: the q51 verified pairs
    * (exact cosine >= 0.95 on SRP candidates) closed into connected
    * components via the shared min-label propagation
    * ([[Components]]), one canonical vector (min id) per cluster —
    * the collection-scale "which vectors are the same content"
    * rollup that a dedup pass consumes, the embedding analogue of
    * q54's text clusters. Scale: edges are the (near-linear) verified
    * candidate set; each round shuffles only (id, label). Oracle:
    * DuckDB recursive-CTE transitive closure + min-reachable. */
  def embeddingClusters(s: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.t(s, dir, "embeddings").select(col("vec_id").as("id"))
    val sim = cosineCandidates(s, dir).filter(col("cosine_raw") >= 0.95)
      .select(col("vec_a").as("src"), col("vec_b").as("dst"))
    val labels = Components.connected(s, s"vec:$dir", vecs, sim, reliable = false)
    val comp = labels.select(col("id").as("vec_id"), col("label").as("cluster_id"))
    val sizes = comp.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "cluster_id")
      .select(col("vec_id"), col("cluster_id"), col("cluster_size"),
        (col("vec_id") === col("cluster_id")).as("is_canonical"))
      .orderBy(col("vec_id"))
  }

  /** The SRP chain (norms → bits → bands → candidate pairs → exact
    * dots) as shared CTE text — composed by both the q51 and q73
    * oracles so the two can never drift. */
  /** The srpWeight mixer's ±1 projection of `embedding` against
    * hyperplane `h`, textually expanded as oracle SQL (free columns:
    * h, embedding; x0 appears 2×, so the final expression repeats it
    * 8× — DuckDB folds the common subexpressions; values stay
    * positive, so % == bitwiseAND mask). Shared by the SRP band chain
    * and the q113 JL projection — ONE definition, or the two would
    * silently diverge from srpWeight. */
  private val srpProjSql: String = {
    val k = s"(CAST(h AS BIGINT) * $DIM + (i - 1))"
    val x0 = s"(($k * 2654435761) % 4294967296)"
    val x1 = s"((xor($x0, $x0 >> 16) * 73244475) % 4294967296)"
    val x2 = s"((xor($x1, $x1 >> 16) * 73244475) % 4294967296)"
    val x3 = s"xor($x2, $x2 >> 16)"
    val w = s"(CASE WHEN (($x3 >> 15) & 1) = 0 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)"
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * $w)), (acc, x) -> acc + x)"
  }

  private val srpDotsCtes = {
    val proj = srpProjSql
    s"""n AS (
       |  SELECT vec_id, ${dotSql("embedding", "embedding")} AS norm2 FROM embeddings),
       |bits AS (
       |  SELECT vec_id, h, CASE WHEN $proj >= 0 THEN 1 ELSE 0 END AS bit
       |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, ${SRP_BITS - 1})) AS h)),
       |bands AS (
       |  SELECT vec_id, h // $SRP_ROWS AS band,
       |         sum(bit * (1 << ($SRP_ROWS - 1 - (h % $SRP_ROWS)))) AS band_val
       |  FROM bits GROUP BY 1, 2),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_val = b.band_val AND a.vec_id < b.vec_id),
       |dots AS (
       |  SELECT vec_a, vec_b, ${dotSql("qa.embedding", "qb.embedding")} AS dot
       |  FROM pairs
       |  JOIN embeddings qa ON qa.vec_id = vec_a
       |  JOIN embeddings qb ON qb.vec_id = vec_b)""".stripMargin
  }

  private val cosineNearDupSql =
    s"""WITH $srpDotsCtes
       |SELECT vec_a, vec_b,
       |       ${snapRoundSql("dot / (sqrt(na.norm2) * sqrt(nb.norm2))", 6)} AS cosine,
       |       dot / (sqrt(na.norm2) * sqrt(nb.norm2)) >= 0.95 AS is_near_dup
       |FROM dots
       |JOIN n na ON vec_a = na.vec_id
       |JOIN n nb ON vec_b = nb.vec_id
       |ORDER BY vec_a, vec_b""".stripMargin

  private val embeddingClustersSql =
    s"""WITH RECURSIVE $srpDotsCtes,
       |sim AS (
       |  SELECT vec_a, vec_b
       |  FROM dots
       |  JOIN n na ON vec_a = na.vec_id
       |  JOIN n nb ON vec_b = nb.vec_id
       |  WHERE dot / (sqrt(na.norm2) * sqrt(nb.norm2)) >= 0.95),
       |edges AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM sim
       |  UNION ALL
       |  SELECT vec_b, vec_a FROM sim),
       |reach AS (
       |  SELECT vec_id AS node, vec_id AS reachable FROM embeddings
       |  UNION
       |  SELECT r.node, e.dst FROM reach r JOIN edges e ON r.reachable = e.src),
       |comp AS (SELECT node AS vec_id, min(reachable) AS cluster_id FROM reach GROUP BY node),
       |csizes AS (SELECT cluster_id, count(1) AS cluster_size FROM comp GROUP BY 1)
       |SELECT vec_id, cluster_id, cluster_size, vec_id = cluster_id AS is_canonical
       |FROM comp JOIN csizes USING (cluster_id)
       |ORDER BY vec_id""".stripMargin

  // ---- q101: product-quantization ANN ------------------------------

  private val PQ_M = 8 // subspaces
  private val PQ_SUB = DIM / PQ_M // dims per subspace
  private val PQ_K = 32 // codewords per subspace
  private val PQ_SHORTLIST = 64 // ADC candidates per query, exact re-ranked

  /** Σ (a_i − b_i)² as the same ordered binary64 left fold as dSum —
    * bit-identical to the oracle's list_reduce mirror. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** q101 — product-quantization ANN (Jégou et al. 2011), completing
    * the FAISS-family trio: IVF (q43/q52/q80) is the PARTITION axis,
    * SQ8 (q87) the scalar-compression axis, PQ the SUBSPACE-
    * compression axis — 64 floats become 8 5-bit codes (5 bytes,
    * ~50× vs float32), the regime where a trillion-vector index fits
    * in RAM. Codebooks are sampled like IVF's centroids (subvector m
    * of sample vector j = codeword (m, j), j < PQ_K = 32); every
    * vector encodes as its per-
    * subspace argmin-L2 codeword (deterministic code tiebreak);
    * search is asymmetric ADC — the query precomputes dot(q_m, cw)
    * for all (m, cw) (an M×K table, 128 doubles per query) and an
    * approximate cosine assembles from table lookups alone, never
    * touching original vectors. Per-subspace partial sums come back
    * as M conditional aggregates added in FIXED order (a bare
    * sum(double) over the M rows would be partial-agg-order-
    * dependent). Scale: codebooks and ADC tables are broadcast-tiny;
    * the collection streams once through encode (M×K broadcast
    * compare) and once through search (M-row lookup per vector) —
    * recall floor vs exact is measured in ScaleSpec. */
  def annPq(s: SparkSession, dir: String): DataFrame = {
    val all = withNorm(Tables.t(s, dir, "embeddings"))
    val mIdx = explode(sequence(lit(0), lit(PQ_M - 1))).as("m")
    val books = all.filter(col("vec_id") < PQ_K)
      .select(col("vec_id").cast(IntegerType).as("code"), col("e"))
      .select(col("code"), mIdx, col("e"))
      .select(col("m"), col("code"),
        slice(col("e"), col("m") * PQ_SUB + 1, lit(PQ_SUB)).as("cw"))
      .withColumn("cwnorm2", dot_product(col("cw"), col("cw")))
    val codes = all.select(col("vec_id"), mIdx, col("e"))
      .select(col("vec_id"), col("m"),
        slice(col("e"), col("m") * PQ_SUB + 1, lit(PQ_SUB)).as("sv"))
      .join(broadcast(books), "m")
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(l2sq(col("sv"), col("cw")).as("d"), col("code"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.code").as("code"))
    val tables = all.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("qid"), col("norm2").as("qnorm2"), mIdx, col("e"))
      .select(col("qid"), col("qnorm2"), col("m"),
        slice(col("e"), col("m") * PQ_SUB + 1, lit(PQ_SUB)).as("qsv"))
      .join(broadcast(books), "m")
      .select(col("qid"), col("qnorm2"), col("m"), col("code"),
        dot_product(col("qsv"), col("cw")).as("pdot"), col("cwnorm2"))
    val partials = codes.join(broadcast(tables), Seq("m", "code"))
      .filter(col("vec_id") !== col("qid"))
      .groupBy(col("qid"), col("qnorm2"), col("vec_id"))
      .agg(
        sum(when(col("m") === 0, col("pdot"))).as("d0"),
        (1 until PQ_M).flatMap(i => Seq(
          sum(when(col("m") === i, col("pdot"))).as(s"d$i"),
          sum(when(col("m") === i, col("cwnorm2"))).as(s"n$i"))) :+
          sum(when(col("m") === 0, col("cwnorm2"))).as("n0"): _*)
    val adot = (1 until PQ_M).foldLeft(col("d0"))((acc, i) => acc + col(s"d$i"))
    val anorm2 = (1 until PQ_M).foldLeft(col("n0"))((acc, i) => acc + col(s"n$i"))
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc_cos").desc, col("cid"))
    // ADC shortlist: the codes-only approximate ranking keeps the top
    // PQ_SHORTLIST per query — the only stage that touches the whole
    // collection, and it reads 8 codes per vector, not 64 floats
    val shortlist = partials
      .select(col("qid"), col("vec_id").as("cid"),
        (adot / (sqrt(col("qnorm2")) * sqrt(anorm2))).as("adc_cos"))
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= PQ_SHORTLIST)
      .select(col("qid"), col("cid"))
    // exact re-rank of the shortlist (the standard ADC+re-rank
    // pipeline): only PQ_SHORTLIST original vectors per query are
    // ever re-read
    val qv = all.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("norm2").as("qnorm2"))
    val cv = all.select(col("vec_id").as("cid"), col("e").as("ce"), col("norm2").as("cnorm2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col("cid"))
    shortlist.join(broadcast(qv), "qid").join(cv, "cid")
      .select(col("qid"), col("cid"),
        (dot_product(col("qe"), col("ce")) /
          (sqrt(col("qnorm2")) * sqrt(col("cnorm2")))).as("cosine_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid").as("query_id"), col("rank"),
        col("cid").as("neighbor_id"), snapRound(col("cosine_raw"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---- shared DuckDB fragments of the q101/q102 oracles ------------
  // parity-critical mirrors of the Spark folds: ONE definition each,
  // composed by both oracle builders, so a fold-order fix can never
  // land in one and silently skip the other

  /** float list → double list, the oracle twin of `withNorm`'s cast */
  private def dbl(x: String) = s"list_transform($x, v -> CAST(v AS DOUBLE))"

  /** ordered squared-L2 fold, the oracle twin of `l2sq`. */
  private def l2Sql(a: String, b: String) =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip($a, $b), " +
      "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), (acc, x) -> acc + x)"

  private val annPqSql = {
    val dParts = (1 until PQ_M).foldLeft("d0")((acc, i) => s"($acc + d$i)")
    val nParts = (1 until PQ_M).foldLeft("n0")((acc, i) => s"($acc + n$i)")
    val condSumsQ = (0 until PQ_M).map(i =>
      s"sum(CASE WHEN t.m = $i THEN t.pdot END) AS d$i, sum(CASE WHEN t.m = $i THEN t.cwnorm2 END) AS n$i")
      .mkString(",\n       ")
    s"""WITH ms AS (SELECT unnest(generate_series(0, ${PQ_M - 1})) AS m),
       |ev AS (SELECT vec_id, ${dbl("embedding")} AS e FROM embeddings),
       |en AS (SELECT vec_id, e, ${dotSql("e", "e")} AS norm2 FROM ev),
       |books AS (
       |  SELECT ms.m, CAST(en.vec_id AS INTEGER) AS code,
       |         en.e[ms.m * $PQ_SUB + 1 : ms.m * $PQ_SUB + $PQ_SUB] AS cw
       |  FROM en, ms WHERE en.vec_id < $PQ_K),
       |booksn AS (SELECT m, code, cw, ${dotSql("cw", "cw")} AS cwnorm2 FROM books),
       |subs AS (
       |  SELECT en.vec_id, ms.m,
       |         en.e[ms.m * $PQ_SUB + 1 : ms.m * $PQ_SUB + $PQ_SUB] AS sv
       |  FROM en, ms),
       |cand AS (
       |  SELECT s.vec_id, s.m, b.code,
       |         row_number() OVER (PARTITION BY s.vec_id, s.m
       |           ORDER BY ${l2Sql("s.sv", "b.cw")}, b.code) AS rn
       |  FROM subs s JOIN booksn b ON s.m = b.m),
       |codes AS (SELECT vec_id, m, code FROM cand WHERE rn = 1),
       |tables_ AS (
       |  SELECT en.vec_id AS qid, en.norm2 AS qnorm2, b.m, b.code,
       |         ${dotSql(s"en.e[b.m * $PQ_SUB + 1 : b.m * $PQ_SUB + $PQ_SUB]", "b.cw")} AS pdot,
       |         b.cwnorm2
       |  FROM en, booksn b WHERE en.vec_id < $N_QUERIES),
       |partials AS (
       |  SELECT t.qid, t.qnorm2, c.vec_id AS cid,
       |       $condSumsQ
       |  FROM codes c JOIN tables_ t ON c.m = t.m AND c.code = t.code
       |  WHERE c.vec_id <> t.qid
       |  GROUP BY 1, 2, 3),
       |adc AS (
       |  SELECT qid, cid, ($dParts) / (sqrt(qnorm2) * sqrt($nParts)) AS adc_cos
       |  FROM partials),
       |shortlist AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |           row_number() OVER (PARTITION BY qid ORDER BY adc_cos DESC, cid) AS adc_rank
       |    FROM adc)
       |  WHERE adc_rank <= $PQ_SHORTLIST),
       |rer AS (
       |  SELECT s.qid, s.cid,
       |         ${dotSql("eq.e", "ec.e")} / (sqrt(eq.norm2) * sqrt(ec.norm2)) AS cosine_raw
       |  FROM shortlist s
       |  JOIN en eq ON s.qid = eq.vec_id
       |  JOIN en ec ON s.cid = ec.vec_id)
       |SELECT qid AS query_id,
       |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine_raw DESC, cid) AS INTEGER) AS rank,
       |       cid AS neighbor_id,
       |       ${snapRoundSql("cosine_raw", 6)} AS cosine
       |FROM rer
       |QUALIFY rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- q102: IVFPQ — the composed at-scale index --------------------

  private val IVFPQ_CELLS = 32
  private val IVFPQ_PROBE = 4

  /** q102 — IVFPQ (Jégou et al. 2011 §V; the FAISS IndexIVFPQ
    * design): the COMPOSITION of the two verified axes — IVF's
    * partition axis (q80: 32 cells × probe 4 scans ~1/8 of the
    * collection at recall ≥ 0.9) and PQ's compression axis (q101:
    * 8 codes/vector, ADC + exact re-rank) — multiplied, which is what
    * a trillion-vector deployment actually runs: the index reads
    * ~1/8 × 8 codes ≈ 1/64th of the float bytes brute force touches.
    *
    * Residual encoding, the part that makes the composition more than
    * a filter: each vector PQ-encodes r = x − c(cell), not x itself —
    * residuals concentrate near 0, so the same 32-codeword budget
    * quantizes them far better than raw vectors (the core IVFPQ
    * insight). Codebooks are sampled from the first PQ_K NON-centroid
    * residuals (the centroids' own residuals are identically zero)
    * and SHARED across cells (the FAISS default). ADC then
    * reconstructs per candidate from lookup tables alone:
    *   dot(q, x̂)  = dot(q, c) + Σₘ dot(qₘ, cwₘ)
    *   ‖x̂‖²      = ‖c‖² + Σₘ (2·dot(cₘ, cwₘ) + ‖cwₘ‖²)
    * where dot(q, c) is per (query, probed cell) — probe × queries
    * rows — dot(qₘ, cw) is the query's M×K ADC table, and the
    * (cell, m, code) table of centroid·codeword dots is index
    * metadata (32×8×32 rows, broadcast). Per-subspace partials come
    * back as M conditional aggregates added in FIXED order (the q101
    * rule), so the approximate cosine is cross-engine deterministic.
    * The exact re-rank of the PQ_SHORTLIST survivors uses the same
    * tiebreak rules as q101.
    *
    * Scale: the collection streams once through assignment (32
    * centroids broadcast), once through encode (M×K residual books
    * broadcast), and search touches only probed cells' codes — every
    * join side that isn't the collection is broadcast-tiny. ScaleSpec
    * asserts recall@1 ≥ 0.9 AND that the scanned fraction is ≤ both
    * parents'. */
  /** The IVFPQ index build (coarse assignment, residual codebooks,
    * code assignment) — shared by q102 and the ScaleSpec codebook
    * non-degeneracy probe. Returns (ranked, all, cents, books,
    * codes). */
  private def ivfPqParts(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ranked = ivfQueryProbes(s, dir, IVFPQ_CELLS)
    val all = withNorm(Tables.t(s, dir, "embeddings"))
    val cents = all.filter(col("vec_id") < IVFPQ_CELLS)
      .select(col("vec_id").as("cell"), col("e").as("ce"), col("norm2").as("cnorm2c"))
    val mIdx = explode(sequence(lit(0), lit(PQ_M - 1))).as("m")
    // residuals r = x − c(cell) over the inverted file
    val resid = ivfFile(s, dir, IVFPQ_CELLS)
      .select(col("vec_id"), col("e"), col("cell"))
      .join(broadcast(cents), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("e"), col("ce"), (x, y) => x - y).as("r"))
    // sample the codebook from NON-centroid residuals: vectors
    // 0..IVFPQ_CELLS-1 are the coarse centroids, each assigned to its
    // own cell, so their residuals are identically ZERO — a codebook
    // sampled there collapses to 32 zero codewords and the whole
    // residual stage becomes a no-op (caught by review; the recall
    // floor survived only because the probed fixture cells fit inside
    // the exact re-rank shortlist)
    val books = resid
      .filter(col("vec_id") >= IVFPQ_CELLS && col("vec_id") < IVFPQ_CELLS + PQ_K)
      .select((col("vec_id") - IVFPQ_CELLS).cast(IntegerType).as("code"), mIdx, col("r"))
      .select(col("m"), col("code"),
        slice(col("r"), col("m") * PQ_SUB + 1, lit(PQ_SUB)).as("cw"))
      .withColumn("cwnorm2", dot_product(col("cw"), col("cw")))
    val codes = resid.select(col("vec_id"), col("cell"), mIdx, col("r"))
      .select(col("vec_id"), col("cell"), col("m"),
        slice(col("r"), col("m") * PQ_SUB + 1, lit(PQ_SUB)).as("sv"))
      .join(broadcast(books), "m")
      .groupBy(col("vec_id"), col("cell"), col("m"))
      .agg(min(struct(l2sq(col("sv"), col("cw")).as("d"), col("code"))).as("best"))
      .select(col("vec_id"), col("cell"), col("m"), col("best.code").as("code"))
    (ranked, all, cents, books, codes)
  }

  /** The inverted file's (vec_id, cell, m, code) assignment — the
    * ScaleSpec seam asserting the codebook actually discriminates. */
  private[graft] def ivfPqCodes(s: SparkSession, dir: String): DataFrame =
    ivfPqParts(s, dir)._5

  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val (ranked, all, cents, books, codes) = ivfPqParts(s, dir)
    val mIdx = explode(sequence(lit(0), lit(PQ_M - 1))).as("m")
    // index metadata: centroid·codeword dots per (cell, m, code)
    val ccw = cents.select(col("cell"), mIdx, col("ce"))
      .select(col("cell"), col("m"),
        slice(col("ce"), col("m") * PQ_SUB + 1, lit(PQ_SUB)).as("cm"))
      .join(broadcast(books), "m")
      .select(col("cell"), col("m"), col("code"),
        dot_product(col("cm"), col("cw")).as("cdot"), col("cwnorm2"))
    // query side: probed cells with exact dot(q, centroid)
    val qp = ranked.filter(col("vec_id") < N_QUERIES && col("rn") <= IVFPQ_PROBE)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("norm2").as("qnorm2"), col("centroid_id").as("qcell"))
      .join(broadcast(cents.withColumnRenamed("cell", "qcell")), "qcell")
      .select(col("qid"), col("qnorm2"), col("qcell"),
        dot_product(col("qe"), col("ce")).as("qcdot"), col("cnorm2c"))
    // the query's M×K ADC table of residual-codeword dots
    val adctab = all.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("qid"), mIdx, col("e"))
      .select(col("qid"), col("m"),
        slice(col("e"), col("m") * PQ_SUB + 1, lit(PQ_SUB)).as("qsv"))
      .join(broadcast(books.select(col("m"), col("code"), col("cw"))), "m")
      .select(col("qid"), col("m"), col("code"),
        dot_product(col("qsv"), col("cw")).as("pdot"))
    val partials = codes
      .join(broadcast(qp), (col("cell") === col("qcell")) && (col("vec_id") !== col("qid")))
      .join(broadcast(adctab), Seq("qid", "m", "code"))
      .join(broadcast(ccw), Seq("cell", "m", "code"))
      .groupBy(col("qid"), col("qnorm2"), col("qcdot"), col("cnorm2c"), col("vec_id"))
      .agg(
        sum(when(col("m") === 0, col("pdot"))).as("d0"),
        (1 until PQ_M).flatMap(i => Seq(
          sum(when(col("m") === i, col("pdot"))).as(s"d$i"),
          sum(when(col("m") === i, col("cdot"))).as(s"c$i"),
          sum(when(col("m") === i, col("cwnorm2"))).as(s"n$i"))) ++ Seq(
          sum(when(col("m") === 0, col("cdot"))).as("c0"),
          sum(when(col("m") === 0, col("cwnorm2"))).as("n0")): _*)
    val adot = (0 until PQ_M).foldLeft(col("qcdot"))((acc, i) => acc + col(s"d$i"))
    val anorm2 = (0 until PQ_M).foldLeft(col("cnorm2c"))((acc, i) =>
      acc + col(s"c$i") * lit(2.0) + col(s"n$i"))
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc_cos").desc, col("cid"))
    val shortlist = partials
      .select(col("qid"), col("vec_id").as("cid"),
        (adot / (sqrt(col("qnorm2")) * sqrt(anorm2))).as("adc_cos"))
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= PQ_SHORTLIST)
      .select(col("qid"), col("cid"))
    val qv = all.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("norm2").as("qnorm2"))
    val cv = all.select(col("vec_id").as("cid"), col("e").as("ce"), col("norm2").as("cnorm2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col("cid"))
    shortlist.join(broadcast(qv), "qid").join(cv, "cid")
      .select(col("qid"), col("cid"),
        (dot_product(col("qe"), col("ce")) /
          (sqrt(col("qnorm2")) * sqrt(col("cnorm2")))).as("cosine_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid").as("query_id"), col("rank"),
        col("cid").as("neighbor_id"), snapRound(col("cosine_raw"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val annIvfPqSql = {
    def sub(x: String) = s"$x[b.m * $PQ_SUB + 1 : b.m * $PQ_SUB + $PQ_SUB]"
    val adot = (0 until PQ_M).foldLeft("qcdot")((acc, i) => s"$acc + d$i")
    val anorm2 = (0 until PQ_M).foldLeft("cnorm2c")((acc, i) => s"$acc + c$i * 2.0 + n$i")
    val condSums = (0 until PQ_M).map(i =>
      s"sum(CASE WHEN c.m = $i THEN t.pdot END) AS d$i, " +
        s"sum(CASE WHEN c.m = $i THEN w.cdot END) AS c$i, " +
        s"sum(CASE WHEN c.m = $i THEN w.cwnorm2 END) AS n$i")
      .mkString(",\n       ")
    s"""WITH ms AS (SELECT unnest(generate_series(0, ${PQ_M - 1})) AS m),
       |ev AS (SELECT vec_id, ${dbl("embedding")} AS e FROM embeddings),
       |en AS (SELECT vec_id, e, ${dotSql("e", "e")} AS norm2 FROM ev),
       |cents AS (SELECT vec_id AS cell, e AS ce, norm2 AS cnorm2c FROM en WHERE vec_id < $IVFPQ_CELLS),
       |csim AS (
       |  SELECT v.vec_id, c.cell AS centroid_id,
       |         ${dotSql("v.e", "c.ce")} / (sqrt(v.norm2) * sqrt(c.cnorm2c)) AS csim
       |  FROM en v, cents c),
       |rankedcells AS (
       |  SELECT vec_id, centroid_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) AS rn
       |  FROM csim),
       |resid AS (
       |  SELECT en.vec_id, rc.centroid_id AS cell,
       |         list_transform(list_zip(en.e, c.ce),
       |           p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) AS r
       |  FROM en
       |  JOIN rankedcells rc ON en.vec_id = rc.vec_id AND rc.rn = 1
       |  JOIN cents c ON rc.centroid_id = c.cell),
       |books AS (
       |  SELECT b.m, CAST(r.vec_id - $IVFPQ_CELLS AS INTEGER) AS code,
       |         ${sub("r.r")} AS cw
       |  FROM resid r, ms b
       |  WHERE r.vec_id >= $IVFPQ_CELLS AND r.vec_id < ${IVFPQ_CELLS + PQ_K}),
       |booksn AS (SELECT m, code, cw, ${dotSql("cw", "cw")} AS cwnorm2 FROM books),
       |subs AS (SELECT r.vec_id, r.cell, b.m, ${sub("r.r")} AS sv FROM resid r, ms b),
       |cand AS (
       |  SELECT s.vec_id, s.cell, s.m, b.code,
       |         row_number() OVER (PARTITION BY s.vec_id, s.m
       |           ORDER BY ${l2Sql("s.sv", "b.cw")}, b.code) AS rn
       |  FROM subs s JOIN booksn b ON s.m = b.m),
       |codes AS (SELECT vec_id, cell, m, code FROM cand WHERE rn = 1),
       |ccw AS (
       |  SELECT c.cell, b.m, b.code, ${dotSql(sub("c.ce"), "b.cw")} AS cdot, b.cwnorm2
       |  FROM cents c, booksn b),
       |qp AS (
       |  SELECT rc.vec_id AS qid, en.norm2 AS qnorm2, rc.centroid_id AS qcell,
       |         ${dotSql("en.e", "c.ce")} AS qcdot, c.cnorm2c
       |  FROM rankedcells rc
       |  JOIN en ON rc.vec_id = en.vec_id
       |  JOIN cents c ON rc.centroid_id = c.cell
       |  WHERE rc.vec_id < $N_QUERIES AND rc.rn <= $IVFPQ_PROBE),
       |adctab AS (
       |  SELECT en.vec_id AS qid, b.m, b.code,
       |         ${dotSql(sub("en.e"), "b.cw")} AS pdot
       |  FROM en, booksn b WHERE en.vec_id < $N_QUERIES),
       |partials AS (
       |  SELECT qp.qid, qp.qnorm2, qp.qcdot, qp.cnorm2c, c.vec_id AS cid,
       |       $condSums
       |  FROM codes c
       |  JOIN qp ON c.cell = qp.qcell AND c.vec_id <> qp.qid
       |  JOIN adctab t ON t.qid = qp.qid AND t.m = c.m AND t.code = c.code
       |  JOIN ccw w ON w.cell = c.cell AND w.m = c.m AND w.code = c.code
       |  GROUP BY 1, 2, 3, 4, 5),
       |shortlist AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
       |             ORDER BY ($adot) / (sqrt(qnorm2) * sqrt($anorm2)) DESC, cid) AS adc_rank
       |    FROM partials)
       |  WHERE adc_rank <= $PQ_SHORTLIST),
       |rer AS (
       |  SELECT s.qid, s.cid,
       |         ${dotSql("eq.e", "ec.e")} / (sqrt(eq.norm2) * sqrt(ec.norm2)) AS cosine_raw
       |  FROM shortlist s
       |  JOIN en eq ON s.qid = eq.vec_id
       |  JOIN en ec ON s.cid = ec.vec_id)
       |SELECT qid AS query_id,
       |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine_raw DESC, cid) AS INTEGER) AS rank,
       |       cid AS neighbor_id,
       |       ${snapRoundSql("cosine_raw", 6)} AS cosine
       |FROM rer
       |QUALIFY rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- q113: JL random projection + fidelity report ----------------

  /** Target dimensionality of the JL projection (64 → 16). */
  private val JL_DIM = 16

  /** Hyperplane-family offset for the JL planes — disjoint from the
    * SRP chain's h ∈ [0, 96) so the two projections decorrelate. */
  private val JL_SEED = 1000

  /** q113 — random-projection dimensionality reduction (the
    * Johnson–Lindenstrauss move; ±1 'database-friendly' projections
    * per Achlioptas 2003) WITH its fidelity report: project every
    * embedding 64 → 16 dims against deterministic srpWeight planes,
    * then measure, per exact-cosine bin, how far the projected cosine
    * drifts (mean/max absolute error over the SRP candidate pairs) —
    * the table that decides whether a downstream dedup/cluster pass
    * can run on the 4×-smaller vectors. Scale: the projection is a
    * narrow map against 16 plan-time-literal planes (the srpPlane
    * trick); the report touches only the near-linear candidate set;
    * everything is ordered double folds — hash-exact cross-engine. */
  def jlDistortion(s: SparkSession, dir: String): DataFrame = {
    val all = withNorm(Tables.t(s, dir, "embeddings"))
    val proj = all.select(col("vec_id") +: (0 until JL_DIM).map(j =>
        dot_product(col("e"), srpPlane(JL_SEED + j)).as(s"y$j")): _*)
      .select(col("vec_id"), array((0 until JL_DIM).map(j => col(s"y$j")): _*).as("p"))
      .withColumn("pn", dot_product(col("p"), col("p")))
      .filter(col("pn") > 0)
    val pairs = cosineCandidates(s, dir)
    val pa = proj.select(col("vec_id").as("vec_a"), col("p").as("pa"), col("pn").as("pna"))
    val pb = proj.select(col("vec_id").as("vec_b"), col("p").as("pb"), col("pn").as("pnb"))
    val cos16 = dot_product(col("pa"), col("pb")) / (sqrt(col("pna")) * sqrt(col("pnb")))
    pairs.join(pa, "vec_a").join(pb, "vec_b")
      .select(
        least(floor((col("cosine_raw") + lit(1.0)) * lit(5)), lit(9.0))
          .cast(IntegerType).as("cos_bin"),
        snapRound(abs(cos16 - col("cosine_raw")), 8).as("err"))
      .groupBy(col("cos_bin"))
      .agg(count(lit(1)).as("n_pairs"),
        snapRound(sum(col("err").cast(DecimalType(38, 10))).cast(DoubleType) /
          count(lit(1)), 6).as("mean_abs_err"),
        snapRound(max(col("err")), 6).as("max_abs_err"))
      .orderBy(col("cos_bin"))
  }

  private val jlDistortionSql = {
    val cos16 = s"(${dotSql("a.p", "b.p")} / (sqrt(a.pn) * sqrt(b.pn)))"
    s"""WITH $srpDotsCtes,
       |ex AS (
       |  SELECT vec_a, vec_b, dot / (sqrt(na.norm2) * sqrt(nb.norm2)) AS cosine_raw
       |  FROM dots
       |  JOIN n na ON vec_a = na.vec_id
       |  JOIN n nb ON vec_b = nb.vec_id),
       |jlh AS (SELECT unnest(generate_series($JL_SEED, ${JL_SEED + JL_DIM - 1})) AS h),
       |jlv AS (SELECT vec_id, h, $srpProjSql AS y FROM embeddings CROSS JOIN jlh),
       |pr AS (SELECT vec_id, list(y ORDER BY h) AS p FROM jlv GROUP BY 1),
       |prn AS (SELECT vec_id, p, ${dotSql("p", "p")} AS pn FROM pr),
       |prf AS (SELECT vec_id, p, pn FROM prn WHERE pn > 0),
       |er AS (
       |  SELECT CAST(least(floor((cosine_raw + 1.0) * 5), 9.0) AS INTEGER) AS cos_bin,
       |         ${snapRoundSql(s"abs($cos16 - cosine_raw)", 8)} AS err
       |  FROM ex
       |  JOIN prf a ON ex.vec_a = a.vec_id
       |  JOIN prf b ON ex.vec_b = b.vec_id)
       |SELECT cos_bin, count(1) AS n_pairs,
       |       ${snapRoundSql("CAST(sum(CAST(err AS DECIMAL(38,10))) AS DOUBLE) / count(1)", 6)} AS mean_abs_err,
       |       ${snapRoundSql("max(err)", 6)} AS max_abs_err
       |FROM er GROUP BY 1 ORDER BY cos_bin""".stripMargin
  }

  // ---- q93: per-label centroid diagnostics -------------------------

  // ---- q108/q109: deterministic k-means + SemDeDup -----------------

  /** k-means cluster count. Small like the IVF fixtures; at scale K
    * grows with N (SemDeDup uses ~50k clusters on billions of docs)
    * and the SAME plans hold — the centroid frame stays K rows,
    * broadcast. */
  private val KM_K = 8

  /** Lloyd refinement rounds. Fixed (not convergence-tested) so the
    * whole fit is one deterministic lazy plan. */
  private val KM_ITERS = 2

  /** One Lloyd assignment pass: argmax cosine to the K centroids with
    * a total (csim DESC, cell) tiebreak — identical double fold in
    * both engines, so the argmax can never disagree. Carries e/norm2
    * through for the next update and cnorm2/csim for diagnostics.
    * The argmax is a `max_by` over the key (csim, -cell), NOT a rank
    * window: all K candidate rows of a vector sit in its partition,
    * so the partial aggregate collapses K→1 map-side and the round
    * shuffles N rows instead of sorting N·K (measured 6.2→1.9 s on
    * the 50k×64-cell doc fit). The ordering key is unique per row
    * (cell is), so the pick is deterministic. */
  private[graft] def kmAssign(base: DataFrame, cents: DataFrame): DataFrame = {
    val sim = (dot_product(col("e"), col("cv")) /
      (sqrt(col("norm2")) * sqrt(col("cnorm2")))).as("csim")
    base.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("e"), col("norm2"), col("cell"), col("cnorm2"), sim)
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("e"), col("norm2"), col("cell"), col("cnorm2"), col("csim")),
        struct(col("csim"), (-col("cell")).as("negcell"))).as("b"))
      .select(col("vec_id"), col("b.e").as("e"), col("b.norm2").as("norm2"),
        col("b.cell").as("cell"), col("b.cnorm2").as("cnorm2"), col("b.csim").as("csim"))
  }

  /** One Lloyd update pass: per-(cell, dim) exact-fold means (the q93
    * centroid rule — order-independent, partitioning can't move them)
    * re-assembled into centroid arrays. A cell that loses all members
    * simply vanishes (no row), deterministically. `intValued` skips
    * the decimal detour when every component is an integer-valued
    * double (feature-hash vectors): integer double sums are exact in
    * any order and ~10× cheaper than DECIMAL(38,12). */
  private def kmUpdate(assigned: DataFrame, intValued: Boolean): DataFrame = {
    val exactSum =
      if (intValued) sum(col("v"))
      else sum(col("v").cast(DecimalType(38, 12))).cast(DoubleType)
    assigned.select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg((exactSum / count(lit(1)).cast(DoubleType)).as("c"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cv"))
      .withColumn("cnorm2", dot_product(col("cv"), col("cv")))
  }

  /** The whole Lloyd fit over any (vec_id, e, norm2) frame: sampled
    * init (the K smallest ids — the IVF seeding rule), KM_ITERS
    * update rounds, final assignment — returned MATERIALIZED
    * (persisted + counted). The K-row centroid frame is
    * localCheckpoint'ed per round (the Components lineage-truncation
    * rule): without it the nested broadcast tree re-plans and
    * re-codegens the whole history each round — measured 4.6 s of
    * pure overhead at sf0.001 (500 rows), i.e. fixed cost, data
    * irrelevant. With per-round truncation each round plans a flat
    * scan→join→agg. No driver-side data path: the checkpoint
    * materializes K rows on executors. */
  private[graft] def kmFit(base0: DataFrame, k: Int, intValued: Boolean): DataFrame =
    kmFitFull(base0, k, intValued)._1

  /** The production-scale fit (SCALING.md `q109_semdedup_sampled`):
    * Lloyd trains on a FIXED-size sample (the sampleN smallest
    * vec_ids — deterministic, the same seeding family as the flat
    * fit's init), then the frozen centroids assign the FULL corpus in
    * ONE pass. This is the SemDeDup/FAISS deployment recipe — the
    * iterative N·K·R fit cost drops to sample·K·R and the corpus pays
    * a single broadcast-assign scan; the flat kmFitFull stays the
    * spec-pinned exact path (and the witness's honest worst case). */
  private[graft] def kmFitSampled(base0: DataFrame, k: Int, sampleN: Long,
      intValued: Boolean): DataFrame = {
    // the seeding rule (like kmFitFull's) assumes dense vec_ids from
    // 0: the first k of the first sampleN ids are the init centroids
    require(k <= sampleN,
      s"kmFitSampled: k=$k centroids cannot seed from a sample of $sampleN vectors")
    val base = base0.persist()
    val sample = base.filter(col("vec_id") < sampleN)
    var cents = sample.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("e").as("cv"), col("norm2").as("cnorm2"))
    for (_ <- 1 to KM_ITERS)
      cents = kmUpdate(kmAssign(sample, cents), intValued)
        .coalesce(1).localCheckpoint()
    val fin = kmAssign(base, cents).persist()
    fin.count()
    base.unpersist()
    fin
  }

  /** SRP band values (id, band, band_val) of any (idCol, vecCol)
    * rows at a given band width — the q51 hyperplane family, shared
    * by the doc and centroid sides of the bucketed assignment so both
    * hash against identical planes. One SELECT per band unioned (the
    * srpBandsOver shape), NOT one projection of all SRP_BITS dots: a
    * single projection carrying 96 dot folds of 64-literal planes
    * overflows whole-stage codegen's method budget and the whole scan
    * falls back to interpreted eval — measured 24.5 s vs ~2 s for the
    * same FLOPs at 50k rows; per-band branches column-prune to
    * rowsPerBand dots each and stay compiled. */
  private def srpBandValsFor(df: DataFrame, idCols: Seq[String],
      vecCol: String, rowsPerBand: Int): DataFrame = {
    require(SRP_BITS % rowsPerBand == 0, s"rowsPerBand must divide $SRP_BITS")
    (0 until SRP_BITS / rowsPerBand).map { b =>
      val bandVal = (0 until rowsPerBand).map { j =>
        val h = b * rowsPerBand + j
        (dot_product(col(vecCol), srpPlane(h)) >= 0).cast(LongType) *
          lit(1L << (rowsPerBand - 1 - j))
      }.reduce(_ + _)
      df.select(idCols.map(col) :+ lit(b).as("band") :+ bandVal.as("band_val"): _*)
    }.reduce(_.unionByName(_))
  }

  /** SRP-bucketed frozen-centroid assignment — the q52 probe shape
    * applied to the Lloyd assign, the scale dial past kmFitSampled:
    * at K ∝ N the one-pass broadcast assign still pays N·K cosine
    * FLOPs; here each vector pays SRP_BITS signature dots plus only
    * the centroids sharing one of its band buckets (expected
    * candidates ≈ K·bands/2^rows — the q51 band-width dial: pick
    * rowsPerBand ≈ log₂(K·bands/C) for a candidate budget C, so
    * per-vector work stays ~constant as K grows), plus an EXACT
    * full-K fallback for the rare vector colliding with no centroid
    * (P ≈ e^-C), so every vector always gets a cell. Approximation is one-sided: a vector whose
    * true-argmax centroid shares a bucket assigns identically to
    * kmAssign (the candidate max is the true max); disagreements are
    * bounded by the probe's recall (KmeansSpec pins exact parity on
    * the clustered fixture shape). Output columns match kmAssign. */
  /** Stage helpers shared by [[kmAssignSrp]] (production) and
    * [[profileSrpAssign]] (its stage-by-stage profiler) — ONE
    * definition of each stage, so a change to the tie-break struct or
    * the fallback anti-join can never drift from what the profiler
    * measures. */
  private def srpCentroidBands(cents: DataFrame, rowsPerBand: Int): DataFrame =
    srpBandValsFor(cents.withColumnRenamed("cv", "cvv"),
      Seq("cell"), "cvv", rowsPerBand)

  private def srpCandIdsOver(db: DataFrame, cb: DataFrame): DataFrame =
    db.join(broadcast(cb), Seq("band", "band_val"))
      .select(col("vec_id"), col("cell")).distinct()

  /** Exact cosine argmax over each vector's bucket-sharing candidate
    * centroids (ties to the lower cell — kmAssign's total order). */
  private def srpScoredAssign(candIds: DataFrame, cents: DataFrame,
      base: DataFrame): DataFrame = {
    val sim = (dot_product(col("e"), col("cv")) /
      (sqrt(col("norm2")) * sqrt(col("cnorm2")))).as("csim")
    candIds
      .join(broadcast(cents), "cell")
      .join(base, "vec_id")
      .select(col("vec_id"), col("e"), col("norm2"), col("cell"), col("cnorm2"), sim)
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("e"), col("norm2"), col("cell"), col("cnorm2"), col("csim")),
        struct(col("csim"), (-col("cell")).as("negcell"))).as("b"))
      .select(col("vec_id"), col("b.e").as("e"), col("b.norm2").as("norm2"),
        col("b.cell").as("cell"), col("b.cnorm2").as("cnorm2"), col("b.csim").as("csim"))
  }

  /** Vectors whose bands collided with NO centroid bucket (P ≈ e^-C)
    * — the exact full-K fallback's input. */
  private def srpMissed(base: DataFrame, candIds: DataFrame): DataFrame =
    base.join(candIds.select(col("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")

  private[graft] def kmAssignSrp(base: DataFrame, cents: DataFrame,
      rowsPerBand: Int): DataFrame = {
    val cb = srpCentroidBands(cents, rowsPerBand)
    val db = srpBandValsFor(base, Seq("vec_id"), "e", rowsPerBand)
    // eager localCheckpoint: candIds feeds BOTH the scored assignment
    // and the fallback anti-join — left lazy, the second consumer
    // recomputes the whole signature chain (~N·SRP_BITS dots)
    val candIds = srpCandIdsOver(db, cb).localCheckpoint()
    srpScoredAssign(candIds, cents, base)
      .unionByName(kmAssign(srpMissed(base, candIds), cents))
  }

  /** tools.SrpAssignProfile's window: stage-by-stage timings and
    * volumes of the bucketed assignment. */
  private[graft] def profileSrpAssign(base0: DataFrame, k: Int,
      sampleN: Long, rowsPerBand: Int): Unit = {
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SRPPROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = base0.persist()
    val sample = base.filter(col("vec_id") < sampleN)
    var cents = sample.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("e").as("cv"), col("norm2").as("cnorm2"))
    t("lloyd fit") {
      for (_ <- 1 to KM_ITERS)
        cents = kmUpdate(kmAssign(sample, cents), intValued = true)
          .coalesce(1).localCheckpoint()
    }
    val cb = srpCentroidBands(cents, rowsPerBand).persist()
    t("centroid bands")(println("  rows=" + cb.count()))
    println("  centroid bucket skew: " + cb.groupBy(col("band"), col("band_val"))
      .count().agg(max(col("count")), avg(col("count"))).head())
    val db = srpBandValsFor(base, Seq("vec_id"), "e", rowsPerBand).persist()
    t("doc bands")(println("  rows=" + db.count()))
    val candIds = srpCandIdsOver(db, cb).persist()
    t("candidates")(println("  rows=" + candIds.count() +
      " (= " + (candIds.count().toDouble / base.count()) + " per doc)"))
    val assigned = t("scored assign") {
      val a = srpScoredAssign(candIds, cents, base)
        .select(col("vec_id"), col("cell")).persist()
      a.count()
      a
    }
    val missed = t("missed fallback") {
      val m = srpMissed(base, candIds).persist()
      println("  missed=" + m.count())
      m
    }
    t("fallback assign")(kmAssign(missed, cents)
      .write.format("noop").mode("overwrite").save())
    Seq(cb, db, candIds, assigned, missed).foreach(_.unpersist())
    base.unpersist()
    ()
  }

  /** kmFitSampled with the SRP-bucketed full-corpus assignment — the
    * measured `q109_semdedup_srp_assign` production path: Lloyd on a
    * fixed sample, frozen centroids hashed into SRP buckets, the
    * corpus pays ~K·bands/2^rows (bounded) cosines per vector instead
    * of K. */
  private[graft] def kmFitSampledSrp(base0: DataFrame, k: Int, sampleN: Long,
      intValued: Boolean, rowsPerBand: Int): DataFrame = {
    require(k <= sampleN,
      s"kmFitSampledSrp: k=$k centroids cannot seed from a sample of $sampleN vectors")
    val base = base0.persist()
    val sample = base.filter(col("vec_id") < sampleN)
    var cents = sample.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("e").as("cv"), col("norm2").as("cnorm2"))
    for (_ <- 1 to KM_ITERS)
      cents = kmUpdate(kmAssign(sample, cents), intValued)
        .coalesce(1).localCheckpoint()
    val fin = kmAssignSrp(base, cents, rowsPerBand).persist()
    fin.count()
    base.unpersist()
    fin
  }

  /** kmFit, also returning the FROZEN final centroid frame (cell, cv,
    * cnorm2) — the trained index a serving path (the streaming ingest
    * twin) assigns against. */
  private[graft] def kmFitFull(base0: DataFrame, k: Int,
      intValued: Boolean): (DataFrame, DataFrame) = {
    val base = base0.persist()
    var cents = base.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("e").as("cv"), col("norm2").as("cnorm2"))
    for (r <- 1 to KM_ITERS) {
      val t0 = System.nanoTime()
      // coalesce(1): the centroid frame is K rows — checkpointing and
      // re-broadcasting it as 32 near-empty partitions costs more
      // tasks than the whole round's math
      cents = kmUpdate(kmAssign(base, cents), intValued)
        .coalesce(1).localCheckpoint()
      if (sys.env.contains("KM_PROBE"))
        println(f"KMPROBE round$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val fin = kmAssign(base, cents).persist()
    fin.count()
    base.unpersist()
    (fin, cents)
  }

  /** Session-lifetime final k-means fit over the embeddings table —
    * q108's artifact: (assignment (vec_id, e, norm2, cell, cnorm2,
    * csim), frozen centroids (cell, cv, cnorm2)), built once per
    * (session, dir). */
  private val kmCache = new graft.util.Memo[(SparkSession, String), (DataFrame, DataFrame)](
    stale = _._1.sparkContext.isStopped)

  private[graft] def kmeansFit(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    kmCache.getOrBuild((s, dir), {
      // embeddings is a noSpread single-file scan (it normally feeds
      // broadcast build sides); here it STREAMS through three rounds
      // of dot products, so fan it out once up front — the iterative
      // chain inherits the width
      val base = withNorm(Tables.t(s, dir, "embeddings"))
        .select(col("vec_id"), col("e"), col("norm2"))
        .repartition(s.sparkContext.defaultParallelism)
      kmFitFull(base, KM_K, intValued = false)
    })

  private[graft] def kmeansAssignment(s: SparkSession, dir: String): DataFrame =
    kmeansFit(s, dir)._1

  /** q108 — deterministic k-means (Lloyd's algorithm): sampled init
    * (the first K vectors, the IVF seeding rule), then KM_ITERS rounds
    * of [cosine argmax assignment → decimal-fold centroid update],
    * reporting per-cluster size, centroid norm, and member-coherence
    * (mean/min cosine to centroid — the q93 diagnostics, now on
    * LEARNED geometric cells instead of given labels). This is the
    * clustering a curation pipeline actually fits (SemDeDup's stage 1,
    * topic balancing, IVF training). Scale: each round is one K-row
    * broadcast against the streaming collection + one (cell, dim)
    * aggregation — the collection never self-joins, and the whole fit
    * is ONE lazy plan (no driver-side centroid collect between
    * rounds). Exactness: assignments compare identical ordered-fold
    * doubles; centroid means are decimal sums — both engines agree
    * bit-for-bit, so the iteration can never fork. */
  def kmeansClusters(s: SparkSession, dir: String): DataFrame =
    kmeansAssignment(s, dir)
      .select(col("cell"), col("cnorm2"), snapRound(col("csim"), 8).as("cos"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        snapRound(sqrt(max(col("cnorm2"))), 6).as("centroid_norm"),
        snapRound(sum(col("cos").cast(DecimalType(38, 10))).cast(DoubleType) /
          count(lit(1)), 6).as("mean_cos"),
        snapRound(min(col("cos")), 6).as("min_cos"))
      .select(col("cell").as("cluster_id"), col("n_vectors"),
        col("centroid_norm"), col("mean_cos"), col("min_cos"))
      .orderBy(col("cluster_id"))

  // ---- q117: hard-negative mining ----------------------------------

  /** Hard negatives mined per anchor. */
  private val HN_K = 3

  /** q117 — hard-negative mining for contrastive training (the DPR /
    * SimCSE / sentence-transformers practice: the negatives that teach
    * are the highest-similarity WRONG-label examples, not random
    * ones): for every labeled vector, the top-HN_K highest-cosine
    * same-cell vectors with a DIFFERENT label. Cells come from the
    * memoized q108 k-means fit, so the mining cost follows the
    * SemDeDup bound — (N/K)·N pairs with K the scale dial — which is
    * exactly how production mines (within an ANN index, never brute
    * force; a multi-probe dial widens recall like q52/q80). Raw-cosine
    * ordering with an id tiebreak is safe cross-engine (both fold the
    * dot identically); output cosine snapped for display. */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    val lab = Tables.t(s, dir, "embeddings").select(col("vec_id"), col("label"))
    val asg = kmeansAssignment(s, dir).join(lab, "vec_id")
    val a = asg.select(col("vec_id").as("p"), col("label").as("p_label"),
      col("e").as("pe"), col("norm2").as("pn"), col("cell"))
    val b = asg.select(col("vec_id").as("q"), col("label").as("q_label"),
      col("e").as("qe"), col("norm2").as("qn"), col("cell").as("qcell"))
    val cosr = (dot_product(col("pe"), col("qe")) /
      (sqrt(col("pn")) * sqrt(col("qn")))).as("cosine_raw")
    val w = Window.partitionBy(col("p")).orderBy(col("cosine_raw").desc, col("q"))
    a.join(b, (col("cell") === col("qcell")) && (col("p_label") !== col("q_label")))
      .select(col("p"), col("p_label"), col("q"), col("q_label"), cosr)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= HN_K)
      .select(col("p").as("vec_id"), col("p_label").as("label"), col("rank"),
        col("q").as("neg_id"), col("q_label").as("neg_label"),
        snapRound(col("cosine_raw"), 6).as("cosine"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** SemDeDup near-duplicate threshold. The embeddings fixture has NO
    * high-cosine pairs (measured max pairwise cosine 0.49), so q109
    * runs on feature-hashed DOCUMENT vectors, where the corpus's real
    * near-dup documents (the q21 minhash fixtures) land at 0.9+. */
  private val SEM_TAU = 0.9

  /** Feature-hash dimensionality for document vectors. */
  private val FH_DIM = 64

  /** k-means K for the document-vector clustering: larger than KM_K
    * because SemDeDup's cost model REQUIRES bounded cluster sizes
    * (N/K) — K is the scale dial that grows with N (the paper runs
    * ~50k clusters on billions of docs). */
  private val KM_DOC_K = 64

  /** Signed feature-hash document vectors (the hashing trick,
    * Weinberger et al. 2009): each token adds ±1 to its md5-chosen
    * dimension of a FH_DIM dense vector. Values are integer-valued
    * doubles, so every sum is EXACT regardless of order/partitioning —
    * no decimal detour needed. One narrow explode + two aggregations;
    * the dense assembly is a map lookup over a 64-slot sequence.
    * Zero-norm vectors (all signs cancelled) are dropped in both
    * engines. */
  private[graft] def docVectors(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{tokens, featureDim, featureSign}
    val sparse = Tables.t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .filter(length(col("t")) > 0)
      .select(col("doc_id"),
        featureDim(col("t"), FH_DIM).as("dim"), featureSign(col("t")).as("sv"))
      .groupBy(col("doc_id"), col("dim")).agg(sum(col("sv")).as("v"))
    sparse.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("dim"), col("v")))).as("m"))
      .select(col("doc_id").as("vec_id"),
        transform(sequence(lit(0), lit(FH_DIM - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("e"))
      .withColumn("norm2", dot_product(col("e"), col("e")))
      .filter(col("norm2") > 0)
  }

  /** Session-lifetime document-vector k-means assignment — q109's
    * artifact (the self-join consumes it twice; without the persist
    * the iterative fit would replan and re-execute per side). */
  private val docKmCache = new graft.util.Memo[(SparkSession, String), (DataFrame, DataFrame)](
    stale = _._1.sparkContext.isStopped)

  /** (assignment, frozen centroids) of the document-vector fit — the
    * centroids feed the q136 multi-probe expansion. */
  private[graft] def docKmeansFull(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    docKmCache.getOrBuild((s, dir),
      kmFitFull(docVectors(s, dir), KM_DOC_K, intValued = true))

  private[graft] def docKmeansAssignment(s: SparkSession, dir: String): DataFrame =
    docKmeansFull(s, dir)._1

  /** q109 — SemDeDup (Abbas et al. 2023): semantic deduplication =
    * cluster the corpus's embeddings with k-means, then remove
    * near-duplicates WITHIN each cluster, keeping the member FARTHEST
    * from its centroid (lowest centroid cosine — the paper's
    * keep-the-atypical rule, which preserves diversity where min-id
    * canonicalization wouldn't). A doc is dropped iff some
    * same-cluster doc within cosine >= SEM_TAU ranks better = LOWER
    * snapped centroid-cosine (tie: lower id); its recorded `dup_of`
    * is the best such witness (max pair cosine, tie lower id). Output
    * is the drop list — the rows a curation pass deletes. Embeddings
    * here are the deterministic feature-hash vectors (docVectors), so
    * the whole operator is hash-exact cross-engine end to end. Scale:
    * the within-cluster self-join is the PAPER's cost model — cluster
    * size is bounded at N/K and K grows with N, so pairs stay
    * (N/K)·N, never N²; the exact-dup fast path (identical vectors)
    * falls out of the same rule via the id tiebreak. */
  def semDedup(s: SparkSession, dir: String): DataFrame = {
    val asg = docKmeansAssignment(s, dir)
    val a = asg.select(col("vec_id").as("p"), col("e").as("pe"), col("norm2").as("pn"),
      col("cell"), snapRound(col("csim"), 8).as("pcs"))
    val b = asg.select(col("vec_id").as("q"), col("e").as("qe"), col("norm2").as("qn"),
      col("cell").as("qcell"), snapRound(col("csim"), 8).as("qcs"))
    val cosr = (dot_product(col("pe"), col("qe")) /
      (sqrt(col("pn")) * sqrt(col("qn")))).as("cosine_raw")
    val w = Window.partitionBy(col("p")).orderBy(col("cosine_raw").desc, col("q"))
    a.join(b, (col("cell") === col("qcell")) && (col("p") !== col("q")))
      .select(col("p"), col("q"), col("cell"), col("pcs"), col("qcs"), cosr)
      .filter(col("cosine_raw") >= SEM_TAU)
      .filter((col("qcs") < col("pcs")) ||
        ((col("qcs") === col("pcs")) && (col("q") < col("p"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p").as("doc_id"), col("cell").as("cluster_id"),
        col("q").as("dup_of"), snapRound(col("cosine_raw"), 6).as("cosine"))
      .orderBy(col("doc_id"))
  }

  // ---- q116: semantic decontamination ------------------------------

  /** Cosine at/above which a training doc counts as semantically
    * contaminated by a held-out eval doc. */
  private val DECON_TAU = 0.8

  /** The held-out benchmark source — SHARED with q62's n-gram decon
    * so the two contamination passes can never drift onto different
    * benchmark sources. */
  private val DeconEvalSource = CorpusOps.EvalSource

  /** q116 — SEMANTIC decontamination: the embedding-space complement
    * of q62's exact n-gram check. A paraphrased benchmark slips an
    * n-gram match entirely (the rephrased-sample findings of Yang et
    * al. 2023, "Rethinking Benchmark and Contamination"); it does NOT
    * slip a high-cosine match. Training docs (source != eval) compare
    * against eval docs on the deterministic feature-hash vectors, but
    * only WITHIN their k-means cell (the q109/SemDeDup cost model —
    * at 100 TB the corpus×benchmark brute force is ~1e15 dot products;
    * cell-bucketed it is that / K, and K grows with N). Output is the
    * contamination list: each flagged train doc with its hit count and
    * best eval witness (max raw cosine, tie lower eval id — raw-double
    * ordering is safe because both engines fold the dot identically).
    * Caveat, same as q109: a cross-cell paraphrase is missed at
    * probe=1; a production pass multi-probes (q52/q80's dial).
    * Scale: reuses the memoized q109 fit; eval rows are benchmark-
    * sized, so the per-cell join is corpus×(eval∩cell) — the corpus
    * never self-joins and never shuffles more than its cell key. */
  def semanticDecon(s: SparkSession, dir: String): DataFrame = {
    val asg = docKmeansAssignment(s, dir)
    val src = Tables.t(s, dir, "documents")
      .select(col("doc_id").as("vec_id"), col("source"))
    val tagged = asg.join(src, "vec_id")
    // the eval side is benchmark-sized — broadcast it so the corpus
    // side never shuffles for the cell join
    val evalSide = broadcast(tagged.filter(col("source") === DeconEvalSource)
      .select(col("vec_id").as("q"), col("e").as("qe"),
        col("norm2").as("qn"), col("cell").as("qcell")))
    val train = tagged.filter(col("source") =!= DeconEvalSource)
      .select(col("vec_id").as("p"), col("e").as("pe"),
        col("norm2").as("pn"), col("cell"))
    val cosr = (dot_product(col("pe"), col("qe")) /
      (sqrt(col("pn")) * sqrt(col("qn")))).as("cosine_raw")
    train.join(evalSide, col("cell") === col("qcell"))
      .select(col("p"), col("q"), col("cell"), cosr)
      .filter(col("cosine_raw") >= DECON_TAU)
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n_eval_hits"),
        max_by(struct(col("q"), col("cell"), col("cosine_raw")),
          struct(col("cosine_raw"), (-col("q")).as("negq"))).as("b"))
      .select(col("p").as("doc_id"), col("b.cell").as("cluster_id"),
        col("b.q").as("eval_doc_id"),
        snapRound(col("b.cosine_raw"), 6).as("cosine"),
        col("n_eval_hits"))
      .orderBy(col("doc_id"))
  }

  // lazy: interpolates docVecCtes/kmChainCtes, declared further down
  // the object (the init-order rule at the top of this file)
  private lazy val semanticDeconSql =
    s"""WITH $docVecCtes,
       |e AS (SELECT vec_id, v FROM dn WHERE norm2 > 0),
       |n AS (SELECT vec_id, norm2 FROM dn WHERE norm2 > 0),
       |${kmChainCtes(KM_DOC_K, FH_DIM)},
       |sd AS (
       |  SELECT a.vec_id, a.cell, d.source
       |  FROM asgF a JOIN documents d ON a.vec_id = d.doc_id),
       |prs AS (
       |  SELECT tp.vec_id AS p, te.vec_id AS q, tp.cell,
       |         ${dotSql("ep.v", "eq.v")} / (sqrt(np.norm2) * sqrt(nq.norm2)) AS cosine_raw
       |  FROM sd tp JOIN sd te ON tp.cell = te.cell
       |  JOIN e ep ON ep.vec_id = tp.vec_id
       |  JOIN e eq ON eq.vec_id = te.vec_id
       |  JOIN n np ON np.vec_id = tp.vec_id
       |  JOIN n nq ON nq.vec_id = te.vec_id
       |  WHERE tp.source <> '$DeconEvalSource' AND te.source = '$DeconEvalSource'),
       |f AS (SELECT * FROM prs WHERE cosine_raw >= $DECON_TAU),
       |rk AS (
       |  SELECT p, q, cell, cosine_raw,
       |         CAST(count(1) OVER (PARTITION BY p) AS BIGINT) AS n_eval_hits,
       |         row_number() OVER (PARTITION BY p ORDER BY cosine_raw DESC, q) AS rn
       |  FROM f)
       |SELECT p AS doc_id, cell AS cluster_id, q AS eval_doc_id,
       |       ${snapRoundSql("cosine_raw", 6)} AS cosine, n_eval_hits
       |FROM rk WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  // ---- q136: multi-probe semantic decontamination -------------------

  /** Probe width for q136 — each eval doc checks its P nearest cells
    * (the q52/q80 recall/latency dial applied to decontamination). */
  private val DeconProbe = 2

  /** The probe-parameterized decon core, shared by q136 and its spec:
    * `tagged` is a (vec_id, e, norm2, cell, source) assignment frame,
    * `cents` the frozen (cell, cv, cnorm2) centroids. Train docs stay
    * in their ONE assigned cell; each EVAL doc expands to its `probe`
    * nearest cells by centroid cosine (rank tie → lower cell), so a
    * paraphrase that landed one cell over is still compared. A (train,
    * eval) pair can never double-count: the train doc lives in exactly
    * one cell and the eval doc's probe cells are distinct. */
  private[graft] def deconProbeCore(tagged: DataFrame, cents: DataFrame,
      probe: Int): DataFrame = {
    val evalBase = tagged.filter(col("source") === DeconEvalSource)
      .select(col("vec_id").as("q"), col("e").as("qe"), col("norm2").as("qn"))
    val psim = (dot_product(col("qe"), col("cv")) /
      (sqrt(col("qn")) * sqrt(col("cnorm2")))).as("psim")
    val wq = Window.partitionBy(col("q")).orderBy(col("psim").desc, col("qcell"))
    // eval side is benchmark-sized; its probe fan-out is benchmark × K
    // rows before the rank cut — still broadcast-tiny
    val evalProbes = broadcast(evalBase
      .crossJoin(broadcast(cents.select(
        col("cell").as("qcell"), col("cv"), col("cnorm2"))))
      .select(col("q"), col("qe"), col("qn"), col("qcell"), psim)
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= probe)
      .select(col("q"), col("qe"), col("qn"), col("qcell")))
    val train = tagged.filter(col("source") =!= DeconEvalSource)
      .select(col("vec_id").as("p"), col("e").as("pe"),
        col("norm2").as("pn"), col("cell"))
    val cosr = (dot_product(col("pe"), col("qe")) /
      (sqrt(col("pn")) * sqrt(col("qn")))).as("cosine_raw")
    train.join(evalProbes, col("cell") === col("qcell"))
      .select(col("p"), col("q"), col("cell"), cosr)
      .filter(col("cosine_raw") >= DECON_TAU)
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n_eval_hits"),
        max_by(struct(col("q"), col("cell"), col("cosine_raw")),
          struct(col("cosine_raw"), (-col("q")).as("negq"))).as("b"))
      .select(col("p").as("doc_id"), col("b.cell").as("cluster_id"),
        col("b.q").as("eval_doc_id"),
        snapRound(col("b.cosine_raw"), 6).as("cosine"),
        col("n_eval_hits"))
      .orderBy(col("doc_id"))
  }

  /** q136 — multi-probe semantic decontamination: q116 with the gap
    * its own scaladoc names CLOSED. At probe=1 an eval doc compares
    * only against its assigned cell, so a cross-cell paraphrase (the
    * eval doc near a cell boundary, the paraphrase just across it) is
    * invisible; here each eval doc probes its P=2 nearest cells —
    * MultiProbeDeconSpec proves a planted cross-cell paraphrase is
    * caught at P=2 and missed at P=1. Scale: cost multiplies by P on
    * the EVAL (benchmark-sized, broadcast) side only — the corpus side
    * still never self-joins and still shuffles nothing beyond its
    * assigned cell key; P is the recall dial exactly as in q52/q80. */
  def semanticDeconMultiProbe(s: SparkSession, dir: String): DataFrame = {
    val (asg, cents) = docKmeansFull(s, dir)
    val src = Tables.t(s, dir, "documents")
      .select(col("doc_id").as("vec_id"), col("source"))
    deconProbeCore(asg.join(src, "vec_id"), cents, DeconProbe)
  }

  // lazy: interpolates docVecCtes/kmChainCtes (init-order rule)
  private lazy val semanticDeconMultiProbeSql =
    s"""WITH $docVecCtes,
       |e AS (SELECT vec_id, v FROM dn WHERE norm2 > 0),
       |n AS (SELECT vec_id, norm2 FROM dn WHERE norm2 > 0),
       |${kmChainCtes(KM_DOC_K, FH_DIM)},
       |sd AS (
       |  SELECT a.vec_id, a.cell, d.source
       |  FROM asgF a JOIN documents d ON a.vec_id = d.doc_id),
       |evq AS (
       |  SELECT s.vec_id AS q, ee.v AS qv, nn.norm2 AS qn
       |  FROM sd s JOIN e ee ON ee.vec_id = s.vec_id
       |  JOIN n nn ON nn.vec_id = s.vec_id
       |  WHERE s.source = '$DeconEvalSource'),
       |epr AS (
       |  SELECT q, qv, qn, cc.cell AS qcell,
       |         ${dotSql("qv", "cc.cv")} / (sqrt(qn) * sqrt(cc.cnorm2)) AS psim
       |  FROM evq CROSS JOIN centn$KM_ITERS cc),
       |epk AS (
       |  SELECT q, qv, qn, qcell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q ORDER BY psim DESC, qcell) AS rn
       |    FROM epr)
       |  WHERE rn <= $DeconProbe),
       |prs AS (
       |  SELECT tp.vec_id AS p, ek.q, tp.cell,
       |         ${dotSql("ep.v", "ek.qv")} / (sqrt(np.norm2) * sqrt(ek.qn)) AS cosine_raw
       |  FROM sd tp
       |  JOIN epk ek ON tp.cell = ek.qcell
       |  JOIN e ep ON ep.vec_id = tp.vec_id
       |  JOIN n np ON np.vec_id = tp.vec_id
       |  WHERE tp.source <> '$DeconEvalSource'),
       |f AS (SELECT * FROM prs WHERE cosine_raw >= $DECON_TAU),
       |rk AS (
       |  SELECT p, q, cell, cosine_raw,
       |         CAST(count(1) OVER (PARTITION BY p) AS BIGINT) AS n_eval_hits,
       |         row_number() OVER (PARTITION BY p ORDER BY cosine_raw DESC, q) AS rn
       |  FROM f)
       |SELECT p AS doc_id, cell AS cluster_id, q AS eval_doc_id,
       |       ${snapRoundSql("cosine_raw", 6)} AS cosine, n_eval_hits
       |FROM rk WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  // ---- q114: vector-index staleness / drift monitor ----------------

  /** Per-cell population-share shift above which the cell flags. */
  private val DriftShareShift = 0.05

  /** Session-lifetime fit of the doc index on the STORED corpus only
    * (doc_id < the q105 ingest cutoff — the SAME stored/incoming
    * split rule q105 uses: stored `< c`, incoming `>= c`):
    * (assignment, frozen centroids). */
  private val driftCache = new graft.util.Memo[(SparkSession, String), (DataFrame, DataFrame)](
    stale = _._1.sparkContext.isStopped)

  private[graft] def storedIndexFit(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    driftCache.getOrBuild((s, dir), {
      val cut = Tables.t(s, dir, "documents")
        .agg(floor(max(col("doc_id")) * lit(0.9)).cast(LongType).as("c"))
      val old = docVectors(s, dir).crossJoin(broadcast(cut))
        .filter(col("vec_id") < col("c")).drop("c")
      kmFitFull(old, KM_DOC_K, intValued = true)
    })

  /** q114 — vector-index staleness monitoring, the question every
    * production ANN/cluster index faces as data keeps arriving: "has
    * the corpus drifted off the trained index enough to retrain?" The
    * index is fit on the STORED corpus (the q105 split rule); the
    * INCOMING batch assigns to the FROZEN centroids; each cell then
    * reports its old/new population share (snapped) and mean
    * assignment cosine — a cell whose share shifts > DriftShareShift
    * flags, and a falling mean cosine on the new mass is the
    * quantization-quality drop that precedes recall loss. Scale: the
    * delta assigns against K broadcast centroids (delta-sized cost,
    * the q105 principle — the stored corpus never re-fits per batch);
    * stats are per-cell two-level aggregates. */
  def indexDrift(s: SparkSession, dir: String): DataFrame = {
    val (asgOld, cents) = storedIndexFit(s, dir)
    val cut = Tables.t(s, dir, "documents")
      .agg(floor(max(col("doc_id")) * lit(0.9)).cast(LongType).as("c"))
    val fresh = docVectors(s, dir).crossJoin(broadcast(cut))
      .filter(col("vec_id") >= col("c")).drop("c")
    val asgNew = kmAssign(fresh, cents)
    def cellStats(asg: DataFrame, pfx: String) =
      asg.select(col("cell"), snapRound(col("csim"), 8).as("cos"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as(s"n_$pfx"),
          snapRound(sum(col("cos").cast(DecimalType(38, 10))).cast(DoubleType) /
            count(lit(1)), 6).as(s"mean_cos_$pfx"))
    val tot = asgOld.agg(count(lit(1)).as("t_old"))
      .crossJoin(asgNew.agg(count(lit(1)).as("t_new")))
    val shareOld = snapRound(coalesce(col("n_old"), lit(0L)).cast(DoubleType) /
      col("t_old").cast(DoubleType), 6)
    val shareNew = snapRound(coalesce(col("n_new"), lit(0L)).cast(DoubleType) /
      col("t_new").cast(DoubleType), 6)
    cents.select(col("cell"))
      .join(broadcast(cellStats(asgOld, "old")), Seq("cell"), "left")
      .join(broadcast(cellStats(asgNew, "new")), Seq("cell"), "left")
      .crossJoin(broadcast(tot))
      .select(col("cell"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        shareOld.as("share_old"), shareNew.as("share_new"),
        col("mean_cos_old"), col("mean_cos_new"),
        (abs(shareOld - shareNew) > DriftShareShift).as("is_shifted"))
      .orderBy(col("cell"))
  }

  /** Outcome of a [[retrainIfStale]] evaluation: whether a refit ran,
    * how many cells flagged, and the centroid snapshot version now
    * published (unchanged on a no-op). */
  case class RetrainOutcome(retrained: Boolean, shiftedCells: Long, version: Long)

  /** The monitoring → ACTION loop q114 only monitors: evaluate the
    * drift report for the published centroid snapshot against a delta,
    * and when any cell's population share shifts past `threshold`,
    * refit the index on stored+delta and ATOMICALLY publish the new
    * centroids through the snapshot pointer (LayerStore.writeSnapshot:
    * the new version's directory is fully written before one POSIX
    * rename flips `_CURRENT`, so a concurrent reader sees either the
    * old index or the new one, never a partial write — and pinned
    * readers keep their version). A no-drift delta is a NO-OP: nothing
    * is written and the published version is unchanged.
    *
    * `storedVecs` are the vectors the published index serves (what it
    * was trained on), `deltaVecs` the arrivals since; both in the
    * (vec_id, e, norm2) shape. The drift test is q114's: per-cell
    * |share_old − share_new| > threshold, with the delta assigned to
    * the FROZEN published centroids (delta-sized cost — the stored
    * corpus is never re-fit just to ask the question). The refit runs
    * kmFitFull over stored ∪ delta — the full Lloyd chain, so the new
    * index reflects the post-drift geometry rather than patching
    * centroids incrementally (RetrainSpec measures recall@1 recovering
    * to the q80 ≥ 0.9 floor on a planted boundary-straddling drift).
    *
    * Scale: the flag evaluation is one broadcast assign over the
    * delta + K-row share aggregates; the refit costs what the original
    * fit cost — which is the point of gating it behind the flag. */
  def retrainIfStale(store: graft.sources.LayerStore, layer: String,
      name: String, storedVecs: DataFrame, deltaVecs: DataFrame, k: Int,
      intValued: Boolean, threshold: Double = DriftShareShift): RetrainOutcome = {
    val cents = store.readSnapshot(layer, name)
    val curVersion = store.snapshotVersion(layer, name).getOrElse(
      sys.error(s"no published centroid snapshot at $layer.$name"))
    def shares(asg: DataFrame, pfx: String) = {
      val t = asg.count().toDouble
      asg.groupBy(col("cell")).agg(count(lit(1)).as(s"n_$pfx"))
        .withColumn(s"share_$pfx",
          col(s"n_$pfx").cast(DoubleType) / lit(t))
    }
    val so = shares(kmAssign(storedVecs, cents), "old")
    val sn = shares(kmAssign(deltaVecs, cents), "new")
    val shifted = cents.select(col("cell"))
      .join(broadcast(so), Seq("cell"), "left")
      .join(broadcast(sn), Seq("cell"), "left")
      .filter(abs(coalesce(col("share_old"), lit(0.0)) -
        coalesce(col("share_new"), lit(0.0))) > threshold)
      .count()
    if (shifted == 0) RetrainOutcome(retrained = false, 0L, curVersion)
    else {
      val (asg, newCents) = kmFitFull(
        storedVecs.unionByName(deltaVecs), k, intValued)
      asg.unpersist() // only the centroid table is the published index
      val v = store.writeSnapshot(layer, name, newCents)
      RetrainOutcome(retrained = true, shifted, v)
    }
  }

  // lazy: interpolates docVecCtes, a val declared further down the
  // object (the init-order rule at the top of this file)
  private lazy val indexDriftSql = {
    val snapMean = snapRoundSql(
      "CAST(sum(CAST(" + snapRoundSql("csim", 8) + " AS DECIMAL(38,10))) AS DOUBLE) / count(1)", 6)
    val shareOld = snapRoundSql("coalesce(n_old, 0) / CAST(t_old AS DOUBLE)", 6)
    val shareNew = snapRoundSql("coalesce(n_new, 0) / CAST(t_new AS DOUBLE)", 6)
    s"""WITH $docVecCtes,
       |cutoff AS (SELECT CAST(floor(max(doc_id) * 0.9) AS BIGINT) AS c FROM documents),
       |e AS (SELECT vec_id, v FROM dn, cutoff WHERE norm2 > 0 AND vec_id < c),
       |n AS (SELECT vec_id, norm2 FROM dn, cutoff WHERE norm2 > 0 AND vec_id < c),
       |${kmChainCtes(KM_DOC_K, FH_DIM)},
       |enew AS (SELECT vec_id, v FROM dn, cutoff WHERE norm2 > 0 AND vec_id >= c),
       |nnew AS (SELECT vec_id, norm2 FROM dn, cutoff WHERE norm2 > 0 AND vec_id >= c),
       |asn AS (
       |  SELECT en.vec_id, cc.cell, cc.cnorm2, nn.norm2,
       |         ${dotSql("en.v", "cc.cv")} / (sqrt(nn.norm2) * sqrt(cc.cnorm2)) AS csim
       |  FROM enew en JOIN nnew nn USING (vec_id) CROSS JOIN centn$KM_ITERS cc),
       |arn AS (
       |  SELECT vec_id, cell, csim,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
       |  FROM asn),
       |asgN AS (SELECT vec_id, cell, csim FROM arn WHERE rn = 1),
       |stato AS (SELECT cell, count(1) AS n_old, $snapMean AS mean_cos_old FROM asgF GROUP BY 1),
       |statn AS (SELECT cell, count(1) AS n_new, $snapMean AS mean_cos_new FROM asgN GROUP BY 1),
       |tot AS (
       |  SELECT (SELECT count(1) FROM asgF) AS t_old,
       |         (SELECT count(1) FROM asgN) AS t_new),
       |cells AS (SELECT cell FROM centn$KM_ITERS),
       |r AS (
       |  SELECT c.cell,
       |         CAST(coalesce(n_old, 0) AS BIGINT) AS n_old,
       |         CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
       |         $shareOld AS share_old, $shareNew AS share_new,
       |         mean_cos_old, mean_cos_new
       |  FROM cells c
       |  LEFT JOIN stato USING (cell)
       |  LEFT JOIN statn USING (cell), tot)
       |SELECT cell, n_old, n_new, share_old, share_new, mean_cos_old, mean_cos_new,
       |       abs(share_old - share_new) > $DriftShareShift AS is_shifted
       |FROM r ORDER BY cell""".stripMargin
  }

  /** The k-means Lloyd chain as CTE text (cent0 → [assign → update]*
    * → final asgF), over pre-defined CTEs `e(vec_id, v)` and
    * `n(vec_id, norm2)` — shared by the q108 (embeddings) and q109
    * (document-vector) oracles. `dim` is the vector length, `k` the
    * init filter. */
  private def kmChainCtes(k: Int, dim: Int): String = {
    def assign(centN: String, tag: String) =
      s"""s$tag AS (
         |  SELECT e.vec_id, c.cell, c.cnorm2, n.norm2,
         |         ${dotSql("e.v", "c.cv")} / (sqrt(n.norm2) * sqrt(c.cnorm2)) AS csim
         |  FROM e JOIN n USING (vec_id) CROSS JOIN $centN c),
         |r$tag AS (
         |  SELECT vec_id, cell, cnorm2, csim,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |  FROM s$tag),
         |asg$tag AS (SELECT vec_id, cell, cnorm2, csim FROM r$tag WHERE rn = 1)""".stripMargin
    val rounds = (0 until KM_ITERS).map { r =>
      s"""${assign(s"centn$r", s"$r")},
         |d$r AS (
         |  SELECT a.cell, t.pos AS pos, e.v[t.pos] AS val
         |  FROM asg$r a JOIN e USING (vec_id), unnest(generate_series(1, $dim)) AS t(pos)),
         |cm$r AS (
         |  SELECT cell, pos,
         |         CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / CAST(count(1) AS DOUBLE) AS c
         |  FROM d$r GROUP BY 1, 2),
         |cent${r + 1} AS (SELECT cell, list(c ORDER BY pos) AS cv FROM cm$r GROUP BY 1),
         |centn${r + 1} AS (SELECT cell, cv, ${dotSql("cv", "cv")} AS cnorm2 FROM cent${r + 1})""".stripMargin
    }.mkString(",\n")
    s"""centn0 AS (
       |  SELECT e.vec_id AS cell, e.v AS cv, n.norm2 AS cnorm2
       |  FROM e JOIN n USING (vec_id) WHERE e.vec_id < $k),
       |$rounds,
       |${assign(s"centn$KM_ITERS", "F")}""".stripMargin
  }

  /** The embeddings-table e/n CTE pair kmChainCtes consumes — shared
    * by the q108 and q117 oracles (parity-critical: the same ordered
    * dot fold must feed both). */
  private val embEnCtes =
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, ${dotSql("embedding", "embedding")} AS norm2 FROM embeddings)""".stripMargin

  private val kmeansClustersSql =
    s"""WITH $embEnCtes,
       |${kmChainCtes(KM_K, DIM)},
       |cosr AS (SELECT cell, cnorm2, ${snapRoundSql("csim", 8)} AS cos FROM asgF)
       |SELECT cell AS cluster_id, count(1) AS n_vectors,
       |       ${snapRoundSql("sqrt(max(cnorm2))", 6)} AS centroid_norm,
       |       ${snapRoundSql("CAST(sum(CAST(cos AS DECIMAL(38,10))) AS DOUBLE) / count(1)", 6)} AS mean_cos,
       |       ${snapRoundSql("min(cos)", 6)} AS min_cos
       |FROM cosr GROUP BY 1 ORDER BY cluster_id""".stripMargin

  private val hardNegativesSql =
    s"""WITH $embEnCtes,
       |${kmChainCtes(KM_K, DIM)},
       |lb AS (
       |  SELECT a.vec_id, a.cell, emb.label
       |  FROM asgF a JOIN embeddings emb USING (vec_id)),
       |prs AS (
       |  SELECT pa.vec_id AS p, pa.label AS p_label,
       |         pb.vec_id AS q, pb.label AS q_label,
       |         ${dotSql("ea.v", "eb.v")} / (sqrt(na.norm2) * sqrt(nb.norm2)) AS cosine_raw
       |  FROM lb pa JOIN lb pb ON pa.cell = pb.cell AND pa.label <> pb.label
       |  JOIN e ea ON ea.vec_id = pa.vec_id
       |  JOIN e eb ON eb.vec_id = pb.vec_id
       |  JOIN n na ON na.vec_id = pa.vec_id
       |  JOIN n nb ON nb.vec_id = pb.vec_id),
       |rk AS (
       |  SELECT p, p_label, q, q_label, cosine_raw,
       |         CAST(row_number() OVER (PARTITION BY p ORDER BY cosine_raw DESC, q) AS INTEGER) AS rank
       |  FROM prs)
       |SELECT p AS vec_id, p_label AS label, rank, q AS neg_id, q_label AS neg_label,
       |       ${snapRoundSql("cosine_raw", 6)} AS cosine
       |FROM rk WHERE rank <= $HN_K
       |ORDER BY vec_id, rank""".stripMargin

  /** The feature-hash document-vector chain (toks → sparse → dense →
    * dn) as CTE text — shared by the q109 and q114 oracles. Ends at
    * `dn(vec_id, v, norm2)`; callers define their own e/n slices. */
  private val docVecCtes = {
    import graft.functions.TextFunctions.{featureDimSql, featureSignSql}
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |sparse AS (
       |  SELECT doc_id, ${featureDimSql("t", FH_DIM)} AS dim,
       |         sum(${featureSignSql("t")}) AS v
       |  FROM toks WHERE len(t) > 0 GROUP BY 1, 2),
       |grid AS (
       |  SELECT d.doc_id, dm.dim
       |  FROM (SELECT DISTINCT doc_id FROM documents) d,
       |       (SELECT unnest(generate_series(0, ${FH_DIM - 1})) AS dim) dm),
       |dense AS (
       |  SELECT g.doc_id AS vec_id,
       |         list(coalesce(s.v, CAST(0 AS DOUBLE)) ORDER BY g.dim) AS v
       |  FROM grid g LEFT JOIN sparse s ON g.doc_id = s.doc_id AND g.dim = s.dim
       |  GROUP BY 1),
       |dn AS (SELECT vec_id, v, ${dotSql("v", "v")} AS norm2 FROM dense)""".stripMargin
  }

  private val semDedupSql = {
    s"""WITH $docVecCtes,
       |e AS (SELECT vec_id, v FROM dn WHERE norm2 > 0),
       |n AS (SELECT vec_id, norm2 FROM dn WHERE norm2 > 0),
       |${kmChainCtes(KM_DOC_K, FH_DIM)},
       |prs AS (
       |  SELECT pa.vec_id AS p, pb.vec_id AS q, pa.cell,
       |         ${snapRoundSql("pa.csim", 8)} AS pcs, ${snapRoundSql("pb.csim", 8)} AS qcs,
       |         ${dotSql("ea.v", "eb.v")} / (sqrt(na.norm2) * sqrt(nb.norm2)) AS cosine_raw
       |  FROM asgF pa JOIN asgF pb ON pa.cell = pb.cell AND pa.vec_id <> pb.vec_id
       |  JOIN e ea ON ea.vec_id = pa.vec_id
       |  JOIN e eb ON eb.vec_id = pb.vec_id
       |  JOIN n na ON na.vec_id = pa.vec_id
       |  JOIN n nb ON nb.vec_id = pb.vec_id),
       |f AS (
       |  SELECT * FROM prs
       |  WHERE cosine_raw >= $SEM_TAU
       |    AND (qcs < pcs OR (qcs = pcs AND q < p))),
       |rk AS (
       |  SELECT p, q, cell, cosine_raw,
       |         row_number() OVER (PARTITION BY p ORDER BY cosine_raw DESC, q) AS rn
       |  FROM f)
       |SELECT p AS doc_id, cell AS cluster_id, q AS dup_of,
       |       ${snapRoundSql("cosine_raw", 6)} AS cosine
       |FROM rk WHERE rn = 1
       |ORDER BY doc_id""".stripMargin
  }

  /** Z-score below which a member counts as a coherence outlier. */
  private val OutlierZ = 2.0

  /** q150 — per-member outlier flags for a labeled embedding set, the
    * actionable follow-up to q93's per-label coherence summary: each
    * vector's cosine to its label centroid is z-scored against the
    * label's own mean/σ, and members more than OutlierZ σ BELOW the
    * mean are flagged as mislabel/contamination candidates (the
    * standard per-class coherence filter run before training on a
    * labeled set; per-label normalization matters because tight and
    * diffuse classes need different absolute cutoffs). Parity: the
    * per-member cosine snaps 8-dp (the q93 rule) so cos and cos² are
    * exact decimals; mean and mean-square fold through decimal sums
    * and snap 6-dp; variance/σ/z are then IEEE steps on identical
    * inputs in both engines (sqrt is correctly rounded), with σ
    * floored at 0 against ulp-negative variance. Scale: the q93 shape
    * — one (label, dim) aggregation, centroids broadcast back, one
    * label-space stats frame broadcast back again; nothing joins at
    * collection size. Emits every member (not just outliers) so the
    * z-spectrum itself is auditable. */
  def embeddingOutliers(s: SparkSession, dir: String): DataFrame = {
    val base = withNorm(Tables.t(s, dir, "embeddings"))
    val cent = base.select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("v").cast(DecimalType(38, 12))).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("c"))
    val centroids = cent.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cv"))
      .withColumn("cnorm2", dot_product(col("cv"), col("cv")))
    val cos = base.join(broadcast(centroids), "label")
      .select(col("vec_id"), col("label"),
        snapRound(dot_product(col("e"), col("cv")) /
          (sqrt(col("norm2")) * sqrt(col("cnorm2"))), 8).as("cos"))
    val stats = cos.groupBy(col("label")).agg(
        // 10-dp (r11 advice): a 6-dp snap before the E[x2]-E[x]2
        // cancellation zeroed the variance of any label tighter than
        // ~1e-6, silently disabling the detector on exactly the
        // tightest clusters; 10-dp keeps the cancellation alive down
        // to sigma ~ 1e-10 while staying above decimal-fold exactness
        snapRound(sum(col("cos").cast(DecimalType(38, 10))).cast(DoubleType) /
          count(lit(1)), 10).as("mean_cos"),
        snapRound(sum((col("cos") * col("cos")).cast(DecimalType(38, 12)))
          .cast(DoubleType) / count(lit(1)), 10).as("mean_sq"))
      .withColumn("std_cos", snapRound(
        sqrt(greatest(col("mean_sq") - col("mean_cos") * col("mean_cos"), lit(0.0))), 6))
    cos.join(broadcast(stats), "label")
      .select(col("label"), col("vec_id"), col("cos"), col("mean_cos"), col("std_cos"),
        when(col("std_cos") > 0.0,
          snapRound((col("cos") - col("mean_cos")) / col("std_cos"), 4)).as("z"))
      .withColumn("is_outlier",
        col("z").isNotNull && col("z") < -OutlierZ)
      .orderBy(col("label"), col("vec_id"))
  }

  private val embeddingOutliersSql = {
    val dotVCv = dotSql("v", "cv")
    val dotCvCv = dotSql("cv", "cv")
    val dotVV = dotSql("v", "v")
    s"""WITH e AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |d AS (
       |  SELECT label, t.pos AS pos, v[t.pos] AS val
       |  FROM e, unnest(generate_series(1, $DIM)) AS t(pos)),
       |cent AS (
       |  SELECT label, pos,
       |         CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / CAST(count(1) AS DOUBLE) AS c
       |  FROM d GROUP BY 1, 2),
       |centroid AS (
       |  SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY 1),
       |cn AS (SELECT label, cv, $dotCvCv AS cnorm2 FROM centroid),
       |cosr AS (
       |  SELECT e.vec_id, e.label,
       |         ${snapRoundSql(s"$dotVCv / (sqrt($dotVV) * sqrt(cn.cnorm2))", 8)} AS cos
       |  FROM e JOIN cn ON e.label = cn.label),
       |st AS (
       |  SELECT label,
       |         ${snapRoundSql("CAST(sum(CAST(cos AS DECIMAL(38,10))) AS DOUBLE) / count(1)", 10)} AS mean_cos,
       |         ${snapRoundSql("CAST(sum(CAST(cos * cos AS DECIMAL(38,12))) AS DOUBLE) / count(1)", 10)} AS mean_sq
       |  FROM cosr GROUP BY 1),
       |sd AS (
       |  SELECT label, mean_cos,
       |         ${snapRoundSql("sqrt(greatest(mean_sq - mean_cos * mean_cos, 0.0))", 6)} AS std_cos
       |  FROM st)
       |SELECT c.label, c.vec_id, c.cos, s.mean_cos, s.std_cos,
       |       CASE WHEN s.std_cos > 0.0 THEN ${snapRoundSql(
      "(c.cos - s.mean_cos) / s.std_cos", 4)} END AS z,
       |       CASE WHEN s.std_cos > 0.0 THEN ${snapRoundSql(
      "(c.cos - s.mean_cos) / s.std_cos", 4)} < -$OutlierZ ELSE false END AS is_outlier
       |FROM cosr c JOIN sd s ON c.label = s.label
       |ORDER BY c.label, c.vec_id""".stripMargin
  }

  /** q93 — labeled-embedding-set health check: per label, the centroid
    * (per-dimension mean), its norm, and the intra-class coherence
    * (mean and min cosine of members to their centroid) — the
    * diagnostics run on a classification/clustering dataset before
    * training on it (a label with low mean-cosine is incoherent; a
    * low min flags outliers/mislabels). Scale: per-dimension means are
    * one (label, dim) aggregation of the exploded stream (decimal
    * folds — order-independent, so partitioning can't move them);
    * the label-count centroid frame broadcasts back and each member's
    * cosine is the same ordered dot_product fold every vector query
    * uses. Nothing joins at collection size.
    * Reference has no vector surface; methodology per standard
    * intra-class cosine coherence checks. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    val base = withNorm(Tables.t(s, dir, "embeddings"))
    val cent = base.select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("v").cast(DecimalType(38, 12))).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("c"))
    val centroids = cent.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cv"))
      .withColumn("cnorm2", dot_product(col("cv"), col("cv")))
    // snap the per-member cosine BEFORE the mean fold: snapped values
    // are exact 8-dp decimals, so the decimal mean is exact in both
    // engines (the Backtest smape_row pattern)
    val cos = base.join(broadcast(centroids), "label")
      .select(col("label"), col("cnorm2"),
        snapRound(dot_product(col("e"), col("cv")) /
          (sqrt(col("norm2")) * sqrt(col("cnorm2"))), 8).as("cos"))
    cos.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        snapRound(sqrt(max(col("cnorm2"))), 6).as("centroid_norm"),
        snapRound(sum(col("cos").cast(DecimalType(38, 10))).cast(DoubleType) /
          count(lit(1)), 6).as("mean_cos"),
        snapRound(min(col("cos")), 6).as("min_cos"))
      .orderBy(col("label"))
  }

  private val labelCentroidsSql = {
    val dotVCv = dotSql("v", "cv")
    val dotCvCv = dotSql("cv", "cv")
    val dotVV = dotSql("v", "v")
    s"""WITH e AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |d AS (
       |  SELECT label, t.pos AS pos, v[t.pos] AS val
       |  FROM e, unnest(generate_series(1, $DIM)) AS t(pos)),
       |cent AS (
       |  SELECT label, pos,
       |         CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / CAST(count(1) AS DOUBLE) AS c
       |  FROM d GROUP BY 1, 2),
       |centroid AS (
       |  SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY 1),
       |cn AS (SELECT label, cv, $dotCvCv AS cnorm2 FROM centroid),
       |cosr AS (
       |  SELECT e.label, cn.cnorm2,
       |         ${snapRoundSql(s"$dotVCv / (sqrt($dotVV) * sqrt(cn.cnorm2))", 8)} AS cos
       |  FROM e JOIN cn ON e.label = cn.label)
       |SELECT label, count(1) AS n_vectors,
       |       ${snapRoundSql("sqrt(max(cnorm2))", 6)} AS centroid_norm,
       |       ${snapRoundSql("CAST(sum(CAST(cos AS DECIMAL(38,10))) AS DOUBLE) / count(1)", 6)} AS mean_cos,
       |       ${snapRoundSql("min(cos)", 6)} AS min_cos
       |FROM cosr GROUP BY 1 ORDER BY label""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_label_centroids" -> labelCentroids,
    "q150_embedding_outliers" -> embeddingOutliers,
    "q157_ann_recall" -> annRecall,
    "q101_ann_pq" -> annPq,
    "q102_ann_ivfpq" -> annIvfPq,
    "q30_cosine_topk" -> cosineTopk,
    "q31_ann_filtered" -> annFiltered,
    "q43_ann_ivf_sampled" -> annIvfSampled,
    "q51_cosine_near_dup" -> cosineNearDup,
    "q52_ann_ivf_probe2" -> annIvfProbe2,
    "q73_embedding_clusters" -> embeddingClusters,
    "q80_ann_ivf_c32_probe4" -> annIvfProbe4,
    "q87_ann_sq8" -> annSq8,
    "q108_kmeans_clusters" -> kmeansClusters,
    "q109_sem_dedup" -> semDedup,
    "q113_jl_distortion" -> jlDistortion,
    "q114_index_drift" -> indexDrift,
    "q116_semantic_decon" -> semanticDecon,
    "q136_decon_multiprobe" -> semanticDeconMultiProbe,
    "q117_hard_negatives" -> hardNegatives)

  override def oracles: Map[String, String] = Map(
    "q93_label_centroids" -> labelCentroidsSql,
    "q150_embedding_outliers" -> embeddingOutliersSql,
    "q157_ann_recall" -> annRecallSql,
    "q101_ann_pq" -> annPqSql,
    "q102_ann_ivfpq" -> annIvfPqSql,
    "q30_cosine_topk" -> topkSql(sameCluster = false, 5),
    "q31_ann_filtered" -> topkSql(sameCluster = true, 3),
    "q43_ann_ivf_sampled" -> annIvfSql(probe = 1),
    "q51_cosine_near_dup" -> cosineNearDupSql,
    "q52_ann_ivf_probe2" -> annIvfSql(probe = 2),
    "q73_embedding_clusters" -> embeddingClustersSql,
    "q80_ann_ivf_c32_probe4" -> annIvfSql(probe = 4, cells = 32),
    "q87_ann_sq8" -> annSq8Sql,
    "q108_kmeans_clusters" -> kmeansClustersSql,
    "q109_sem_dedup" -> semDedupSql,
    "q113_jl_distortion" -> jlDistortionSql,
    "q114_index_drift" -> indexDriftSql,
    "q116_semantic_decon" -> semanticDeconSql,
    "q136_decon_multiprobe" -> semanticDeconMultiProbeSql,
    "q117_hard_negatives" -> hardNegativesSql)
}
