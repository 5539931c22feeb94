package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: media as opaque binary payloads with
  * typed metadata, decoded/feature-extracted in partition-local
  * batches via mapPartitions (the Scala analogue of mapInPandas batch
  * UDFs: amortize per-batch setup — a real codec would be initialized
  * once per partition, not per row).
  *
  * The codec itself is STUBBED — this container has no image/audio
  * libraries — with `fakeDecode`, a deterministic byte-level feature
  * extractor, clearly marked. Everything around it (schema, batch
  * shape, partition parallelism, output columns) is the real
  * production plumbing and is spec-tested (MediaPipelineSpec).
  */
object MediaPipeline {

  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  case class MediaFeatures(doc_id: Long, mime: String, byte_len: Int,
    checksum64: Long, n_frames: Int, frame_sample: Array[Int])

  /** STUB — stands in for image/audio decode (no codec libs in this
    * environment). Deterministic byte-level features: checksum of the
    * first 64 bytes + one "frame" sampled per 256-byte block (its
    * first byte). The frame COUNT is floor(len/256)+1 — identical to
    * the column-wise q39 twin (the final, possibly-empty partial
    * frame counts; minimum 1) — with a 0 sample for an offset past
    * the payload, like fakeResize's padding. A NULL payload decodes
    * as empty media (documented deviation from the column-wise twin,
    * which propagates NULL features). A real implementation would
    * decode pixels/samples here; the signature and batch shape would
    * not change. */
  def fakeDecode(payloadOrNull: Array[Byte]): (Long, Array[Int]) = {
    val payload = if (payloadOrNull == null) Array.emptyByteArray else payloadOrNull
    val checksum = payload.take(64).foldLeft(0L)((acc, b) => acc + (b & 0xff))
    val n = payload.length / 256 + 1
    val frames = Array.tabulate(n)(i =>
      if (i * 256 < payload.length) payload(i * 256) & 0xff else 0)
    (checksum, frames)
  }

  /** Partition-local batch decode: one pass per partition, codec
    * "initialized" once per partition (the iterator wrapper), rows
    * processed in order. No shuffle — parallelism is the input
    * partitioning. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (expensive, once)
      rows.map { r =>
        val (checksum, frames) = fakeDecode(r.payload)
        val len = if (r.payload == null) 0 else r.payload.length
        MediaFeatures(r.doc_id, r.mime, len, checksum, frames.length, frames)
      }
    }
  }

  /** documents.text → binary payload dataset (stand-in for reading
    * real media bytes; schema/partitioning identical). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), lit("text/plain").as("mime"),
      col("text").cast("binary").as("payload")).as[MediaRow]
  }

  case class ResizedMedia(doc_id: Long, mime: String, width: Int,
    height: Int, pixels: Array[Int])

  /** STUB resize — stands in for image downscale (no codec libs).
    * Treats the payload as a row-major byte "image" and box-samples it
    * to a fixed `side`×`side` grid: each output cell is the byte at
    * the top-left of its source box (a real implementation would
    * average the box after decode; signature, batch shape, and the
    * fixed-size output schema would not change). Short payloads pad
    * with 0 — output dimensions are ALWAYS side×side, the property
    * downstream training pipelines rely on. */
  def fakeResize(payloadOrNull: Array[Byte], side: Int): Array[Int] = {
    val payload = if (payloadOrNull == null) Array.emptyByteArray else payloadOrNull
    val srcSide = math.max(1, math.sqrt(payload.length.toDouble).toInt)
    Array.tabulate(side * side) { i =>
      val (r, c) = (i / side, i % side)
      val idx = (r * srcSide / side) * srcSide + (c * srcSide / side)
      if (idx < payload.length) payload(idx) & 0xff else 0
    }
  }

  /** Partition-local batch resize to a fixed grid — same mapPartitions
    * shape as extractFeatures (codec init once per partition). */
  def resizeAll(media: Dataset[MediaRow], side: Int = 8): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => ResizedMedia(r.doc_id, r.mime, side, side,
        fakeResize(r.payload, side)))
    }
  }
}
