package graft.operators

import graft.{QueryModule, Tables}
import graft.util.Parity._
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
  * Top-k is a per-query rank window. The IVF variant (q31) restricts
  * the pair join to the query's cluster (label = precomputed coarse
  * quantizer assignment), cutting candidates by the cluster fan-out —
  * the standard ANN scale path. At real scale the broadcast side is
  * the query batch (bounded), the collection streams — exactly this
  * plan.
  *
  * Determinism: per-element products stay double (IEEE-identical in
  * both engines); the fold accumulates into DECIMAL(38,20) — exact
  * and order-independent — so cosines are bit-identical to the
  * oracle's unnest+grouped-decimal-sum formulation and rank windows
  * can never disagree.
  */
object VectorOps extends QueryModule {

  private val dec = DecimalType(38, 20)
  private val N_QUERIES = 20

  /** Σ x_i as decimal, folded array-locally. The cast-back keeps the
    * accumulator type fixed (decimal + decimal loses a scale digit to
    * the precision cap); the 1e-19 intermediate rounding is 13 orders
    * below the 1e-6 output snap and any cosine gap. */
  private def decSum(arr: Column): Column =
    aggregate(arr, lit(0).cast(dec), (acc, v) => (acc + v.cast(dec)).cast(dec))

  private def withNorm(df: DataFrame): DataFrame = {
    val xs = transform(col("embedding"), x => x.cast(DoubleType))
    df.select(col("vec_id"), col("label"), xs.as("e"))
      .withColumn("norm2", decSum(transform(col("e"), x => x * x)).cast(DoubleType))
  }

  private def topk(s: SparkSession, dir: String, sameCluster: Boolean, k: Int): DataFrame = {
    val all = withNorm(Tables.t(s, dir, "embeddings"))
    val q = all.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("e").as("qe"), col("norm2").as("qnorm2"))
    val c = all.select(col("vec_id").as("cid"), col("label").as("clabel"),
      col("e").as("ce"), col("norm2").as("cnorm2"))
    val cond = (col("qid") !== col("cid")) &&
      (if (sameCluster) col("qlabel") === col("clabel") else lit(true))
    val dot = decSum(zip_with(col("qe"), col("ce"), (x, y) => x * y)).cast(DoubleType)
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

  /** q31 — IVF-style ANN: search only the query's own cluster
    * (label = precomputed coarse-quantizer assignment). */
  def annIvf(s: SparkSession, dir: String): DataFrame =
    topk(s, dir, sameCluster = true, k = 3)

  private def topkSql(sameCluster: Boolean, k: Int): String = {
    val clusterPred = if (sameCluster) "AND q.label = c.label" else ""
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |         CAST(unnest(embedding) AS DOUBLE) AS x,
       |         unnest(generate_series(1, len(embedding))) AS pos
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, CAST(sum(CAST(x * x AS DECIMAL(38,20))) AS DOUBLE) AS norm2
       |  FROM e GROUP BY vec_id),
       |dots AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |         CAST(sum(CAST(q.x * c.x AS DECIMAL(38,20))) AS DOUBLE) AS dot
       |  FROM e q JOIN e c ON q.pos = c.pos AND q.vec_id <> c.vec_id $clusterPred
       |  WHERE q.vec_id < $N_QUERIES
       |  GROUP BY 1, 2),
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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_cosine_topk" -> cosineTopk,
    "q31_ann_ivf" -> annIvf)

  override def oracles: Map[String, String] = Map(
    "q30_cosine_topk" -> topkSql(sameCluster = false, 5),
    "q31_ann_ivf" -> topkSql(sameCluster = true, 3))
}
