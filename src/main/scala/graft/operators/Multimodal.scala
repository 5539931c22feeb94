package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, batch feature extraction, frame sampling. The real
  * codec step is STUBBED deterministically (no image/audio libs in
  * this environment — see graft.multimodal.MediaPipeline for the
  * mapPartitions batch-decode plumbing and its spec); everything
  * Spark-side — schema, batching, partitioning, feature columns — is
  * real and oracle-checked.
  */
object Multimodal extends QueryModule {

  /** q39 — binary payload features: documents.text re-encoded as a
    * binary payload column (stand-in for image/audio bytes), then
    * length / checksum / fake frame-sampling metadata extracted
    * column-wise. Checksum = sum of the first 64 bytes — the
    * deterministic stand-in for "decode and summarize". */
  def binaryFeatures(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.t(s, dir, "documents")
      .withColumn("payload", col("text").cast(BinaryType))
    d.select(
      col("doc_id"),
      length(col("payload")).as("byte_len"),
      expr("aggregate(transform(sequence(1, least(64, length(text))), i -> ascii(substring(text, i, 1))), 0L, (acc, v) -> acc + v)")
        .as("checksum64"),
      (floor(length(col("payload")) / lit(256)) + lit(1)).cast(LongType).as("n_frames"),
      substring(base64(col("payload")), 1, 16).as("payload_preview"))
      .orderBy(col("doc_id"))
  }

  private val binaryFeaturesSql =
    """SELECT doc_id,
      |       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
      |       CAST(list_aggregate(list_transform(generate_series(1, least(64, length(text))),
      |                      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)), 'sum') AS BIGINT) AS checksum64,
      |       CAST(floor(length(text) / 256) + 1 AS BIGINT) AS n_frames,
      |       substr(to_base64(CAST(text AS BLOB)), 1, 16) AS payload_preview
      |FROM documents ORDER BY doc_id""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_multimodal_features" -> binaryFeatures)

  override def oracles: Map[String, String] = Map(
    "q39_multimodal_features" -> binaryFeaturesSql)
}
