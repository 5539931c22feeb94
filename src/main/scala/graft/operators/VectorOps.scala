package graft.operators

import graft.{QueryModule, Tables}
import graft.util.Parity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: array<float>, label).
  *
  * Shape: explode to (id, pos, x) rows, compute dot products as an
  * equi-join on position + one hash aggregation, norms as a second
  * aggregation — i.e. similarity as plain relational algebra, which
  * is what scales: the position join shuffles on `pos` bucket-local
  * pieces, the per-pair sum is a standard partial-aggregated groupBy,
  * and top-k is a per-query window. The IVF variant (q31) adds a
  * cluster-equality predicate to the join (label = precomputed
  * centroid assignment), cutting the candidate set by the cluster
  * fan-out — the standard ANN scale path.
  *
  * Determinism: per-position products stay double (IEEE-identical in
  * both engines), the reduction runs on DECIMAL(38,20) — exact and
  * order-independent — so cosines are bit-identical and rank windows
  * can never disagree across engines or partitionings.
  */
object VectorOps extends QueryModule {

  private val dec = DecimalType(38, 20)
  private val N_QUERIES = 20

  /** (id, label, pos, x) exploded view. */
  private def exploded(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), col("pos"),
        col("col").cast(DoubleType).as("x"))

  /** Squared norms per vector (exact decimal sum). */
  private def norms(e: DataFrame): DataFrame =
    e.groupBy(col("vec_id")).agg(sum((col("x") * col("x")).cast(dec)).cast(DoubleType).as("norm2"))

  private def topk(s: SparkSession, dir: String, sameCluster: Boolean, k: Int): DataFrame = {
    val e = exploded(s, dir)
    val n = norms(e)
    val q = e.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("pos"), col("x").as("qx"))
    val joinCond = (col("pos") === col("cpos")) &&
      (col("qid") !== col("cid")) &&
      (if (sameCluster) col("qlabel") === col("clabel") else lit(true))
    val c = e.select(col("vec_id").as("cid"), col("label").as("clabel"),
      col("pos").as("cpos"), col("x").as("cx"))
    val dots = q.join(c, joinCond)
      .groupBy(col("qid"), col("cid"))
      .agg(sum((col("qx") * col("cx")).cast(dec)).cast(DoubleType).as("dot"))
    val cosine = col("dot") / (sqrt(col("qn.norm2")) * sqrt(col("cn.norm2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine_raw").desc, col("cid"))
    dots
      .join(n.as("qn"), col("qid") === col("qn.vec_id"))
      .join(n.as("cn"), col("cid") === col("cn.vec_id"))
      .select(col("qid"), col("cid"), cosine.as("cosine_raw"))
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
