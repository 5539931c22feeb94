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

  /** Frame window / hop (bytes). Hop < window = overlapping frames,
    * the audio-analysis shape (a real deployment uses sample counts;
    * the byte payload stands in for PCM). */
  private val FrameWin = 64
  private val FrameHop = 32

  /** q120 — overlapping-window frame features: the audio frame-sample
    * operator shape (window FrameWin, hop FrameHop — hop < window, so
    * frames OVERLAP, unlike q72's disjoint-ish chunking) over the
    * opaque binary payload. Per frame: energy (sum of squared byte
    * values — exact integer arithmetic, the libm-free stand-in for
    * RMS), peak byte, and a silence count (space bytes). Frame count =
    * ceil(max(len-W,0)/H)+1: the tail frame is emitted TRUNCATED,
    * never dropped — the floor-based librosa-style count silently
    * loses the last partial window of every payload (caught by the
    * MediaPipelineSpec coverage invariant), and a doc shorter than one
    * window is its own single frame. Scale: a narrow per-row explode — no
    * shuffle at all until the output sort; each frame reads only its
    * byte slice, and at 100 TB the same plan runs with the decode
    * seam (MediaPipeline) supplying real PCM instead of text bytes. */
  def frameEnergy(s: SparkSession, dir: String): DataFrame = {
    val nFrames = ceil(greatest(col("len") - lit(FrameWin), lit(0))
      .cast(DoubleType) / lit(FrameHop)).cast(IntegerType)
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .filter(col("len") > 0)
      .select(col("doc_id"), col("text"), col("len"),
        explode(sequence(lit(0), nFrames)).as("frame_idx"))
      .withColumn("bytes", expr(
        s"transform(sequence(frame_idx * $FrameHop + 1, least(frame_idx * $FrameHop + $FrameWin, len)), i -> ascii(substring(text, i, 1)))"))
      .select(col("doc_id"), col("frame_idx"),
        size(col("bytes")).as("frame_len"),
        expr("aggregate(bytes, 0L, (acc, v) -> acc + CAST(v AS BIGINT) * CAST(v AS BIGINT))")
          .as("energy"),
        expr("CAST(array_max(bytes) AS BIGINT)").as("peak_byte"),
        expr("CAST(size(filter(bytes, v -> v = 32)) AS BIGINT)").as("n_silent"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val frameEnergySql =
    s"""WITH f AS (
       |  SELECT doc_id, text, length(text) AS len,
       |         unnest(generate_series(0,
       |           CAST(ceil(greatest(length(text) - $FrameWin, 0) / CAST($FrameHop AS DOUBLE)) AS BIGINT))) AS fi
       |  FROM documents WHERE length(text) > 0),
       |b AS (
       |  SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
       |         list_transform(generate_series(fi * $FrameHop + 1, least(fi * $FrameHop + $FrameWin, len)),
       |                        i -> ascii(substr(text, CAST(i AS INTEGER), 1))) AS bytes
       |  FROM f)
       |SELECT doc_id, frame_idx,
       |       CAST(len(bytes) AS INTEGER) AS frame_len,
       |       CAST(list_aggregate(list_transform(bytes, v -> CAST(v AS BIGINT) * CAST(v AS BIGINT)), 'sum') AS BIGINT) AS energy,
       |       CAST(list_aggregate(bytes, 'max') AS BIGINT) AS peak_byte,
       |       CAST(len(list_filter(bytes, v -> v = 32)) AS BIGINT) AS n_silent
       |FROM b ORDER BY doc_id, frame_idx""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_multimodal_features" -> binaryFeatures,
    "q120_frame_energy" -> frameEnergy)

  override def oracles: Map[String, String] = Map(
    "q39_multimodal_features" -> binaryFeaturesSql,
    "q120_frame_energy" -> frameEnergySql)
}
