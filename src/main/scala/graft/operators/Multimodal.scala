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
      // per-partition sort, not a total order (guide §2.4, the q04
      // rule): frame rows scale with the corpus and the compare gates
      // are row-order-insensitive
      .sortWithinPartitions(col("doc_id"), col("frame_idx"))
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

  /** Hex-digit value of one lowercase md5 hex char, as a SQL snippet
    * usable in both engines (the TextFunctions.hexDigit rule). */
  private def hexDigSql(c: String): String =
    s"(CASE WHEN ascii($c) >= 97 THEN ascii($c) - 87 ELSE ascii($c) - 48 END)"

  /** The deterministic 8×8 grayscale fixture each document renders:
    * group g = doc_id DIV 4 picks a base image (pixel i = first two
    * md5 hex chars of 'img|g|i' → 0..255, the featureDim recipe
    * without the mod), and the three non-zero group members perturb
    * ONE pixel (index (r·17) % 64, value +120 mod 256) — so each
    * group of four documents holds near-duplicate images a perceptual
    * hash must catch and byte-exact dedup would miss. One scalar
    * expression, rendered per engine (md5 takes BINARY in Spark,
    * VARCHAR in DuckDB; `iRef` is the pixel-index reference; group
    * division is DIV vs //). Parity-critical pair — the two
    * renderings must stay the same integer math. */
  private def pixelValueSql(md5Of: String => String, div: String,
      iRef: String): String = {
    val base = {
      val h = md5Of(s"concat('img|', CAST(doc_id $div 4 AS STRING), '|', CAST($iRef AS STRING))")
      s"(${hexDigSql(s"substring($h, 1, 1)")} * 16 + ${hexDigSql(s"substring($h, 2, 1)")})"
    }
    s"""CASE WHEN doc_id % 4 <> 0 AND $iRef = ((doc_id % 4) * 17) % 64
       |     THEN ($base + 120) % 256 ELSE $base END""".stripMargin
  }

  /** q163 — perceptual image near-duplicate pairs through the REAL
    * codec: each document's fixture grid renders to an actual PNG
    * (TYPE_INT_RGB, r=g=b so BT.601 luma is exact), the payload
    * decodes back through javax.imageio (MediaPipeline.decodeAll — the
    * mapPartitions batch-decode seam), aHash-64 fingerprints the 8×8
    * luma sample, and near-dup pairs verify at Hamming ≤ 7 via the
    * banded join (8 bands × 8 bits: pigeonhole makes recall EXACT at
    * ≤ 7, not probabilistic — the visual twin of q21-q23's MinHash
    * with a stronger guarantee). The DuckDB oracle recomputes the
    * same integers from the fixture definition (encode→decode is an
    * exact luma round trip), so the whole modality is hash-verified
    * end to end like the text dedup family. Scale: one 8-rows-per-
    * image explode, a bucket-keyed self-join (never all-pairs),
    * candidate-bounded popcount verify; the PNG encode stage is
    * partition-local with no shuffle. */
  def imageNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.MediaPipeline
    val px = Tables.t(s, dir, "documents")
      .select(col("doc_id"), expr(
        s"transform(sequence(0, 63), i -> ${pixelValueSql(m => s"md5(CAST($m AS BINARY))", "DIV", "i")})").as("px"))
      .as[(Long, Array[Int])]
    val media = px.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, p) =>
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 8; x <- 0 until 8) {
          val v = p(y * 8 + x) & 0xff
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaPipeline.MediaRow(id, "image/png", bos.toByteArray)
      }
    }
    MediaPipeline.imageNearDup(MediaPipeline.imageHashes(media))
  }

  private val imageNearDupSql = {
    val pixel = pixelValueSql(m => s"md5($m)", "//", "idx.i")
    s"""WITH idx AS (SELECT unnest(generate_series(0, 63)) AS i),
       |px AS (
       |  SELECT d.doc_id, idx.i,
       |         $pixel AS v
       |  FROM documents d CROSS JOIN idx),
       |m AS (SELECT doc_id, CAST(sum(v) AS BIGINT) // 64 AS mean FROM px GROUP BY 1),
       |bits AS (
       |  SELECT p.doc_id, p.i, CASE WHEN p.v >= m.mean THEN 1 ELSE 0 END AS b
       |  FROM px p JOIN m ON p.doc_id = m.doc_id),
       |bands AS (
       |  SELECT doc_id, i // 8 AS band,
       |         CAST(sum(b * (1 << (i % 8))) AS BIGINT) AS key
       |  FROM bits GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |ham AS (
       |  SELECT c.doc_a, c.doc_b,
       |         CAST(sum(CASE WHEN ba.b <> bb.b THEN 1 ELSE 0 END) AS INTEGER) AS hamming
       |  FROM cand c
       |  JOIN bits ba ON ba.doc_id = c.doc_a
       |  JOIN bits bb ON bb.doc_id = c.doc_b AND bb.i = ba.i
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, hamming FROM ham
       |WHERE hamming <= 7
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Frames per fixture video / sampling stride (keep every 2nd frame
    * — the videoFrames default, so the oracle filters f % 2 = 0). */
  private val VidFrames = 6
  private val VidEvery = 2

  /** The deterministic multi-frame fixture each document renders: group
    * g = doc_id DIV 4 picks a base CLIP (frame f's pixel i = first two
    * md5 hex chars of 'vid|g|f|i'), and the three non-zero group
    * members are "re-encoded" copies perturbing ONE pixel PER FRAME
    * (index (r·17 + f·5) % 64, value +120 mod 256) — per-frame noise a
    * byte-exact hash misses but the perceptual aHash rides through.
    * Parity-critical pair with the Spark rendering (q163's
    * pixelValueSql rule, plus the frame axis). */
  private def framePixelSql(md5Of: String => String, div: String,
      fRef: String, iRef: String): String = {
    val base = {
      val h = md5Of(s"concat('vid|', CAST(doc_id $div 4 AS STRING), '|', " +
        s"CAST($fRef AS STRING), '|', CAST($iRef AS STRING))")
      s"(${hexDigSql(s"substring($h, 1, 1)")} * 16 + ${hexDigSql(s"substring($h, 2, 1)")})"
    }
    s"""CASE WHEN doc_id % 4 <> 0 AND $iRef = ((doc_id % 4) * 17 + $fRef * 5) % 64
       |     THEN ($base + 120) % 256 ELSE $base END""".stripMargin
  }

  /** q165 — cross-video FRAME near-duplicate pairs through the REAL
    * multi-frame codec: each document's fixture clip renders to an
    * actual multi-page TIFF (the JDK's canonical multi-frame container;
    * TYPE_INT_RGB with r=g=b so BT.601 luma round-trips exactly), the
    * payload decodes back through javax.imageio sequence readers
    * (MediaPipeline.decodeFrames), the frame sampler keeps every 2nd
    * frame and aHash-64 fingerprints each kept frame, and near-dup
    * frame pairs across DIFFERENT videos verify at Hamming ≤ 7 via the
    * banded join — pigeonhole-exact recall, the q163 guarantee lifted
    * to the video tier. The DuckDB oracle recomputes the same integers
    * from the fixture definition (encode→decode is an exact luma round
    * trip). Scale: encode/decode are partition-local with no shuffle;
    * the join is bucket-keyed over 8 rows per kept frame, never
    * all-pairs. */
  def videoNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.MediaPipeline
    val perFrame = 64
    val px = Tables.t(s, dir, "documents")
      .select(col("doc_id"), expr(
        s"transform(sequence(0, ${VidFrames * perFrame - 1}), j -> ${
          framePixelSql(m => s"md5(CAST($m AS BINARY))", "DIV",
            s"(j DIV $perFrame)", s"(j % $perFrame)")})").as("px"))
      .as[(Long, Array[Int])]
    val media = px.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, p) =>
        val bos = new java.io.ByteArrayOutputStream()
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("tiff").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          for (f <- 0 until VidFrames) {
            val img = new java.awt.image.BufferedImage(8, 8,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            for (y <- 0 until 8; x <- 0 until 8) {
              val v = p(f * perFrame + y * 8 + x) & 0xff
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
          }
          writer.endWriteSequence()
        } finally { ios.close(); writer.dispose() }
        MediaPipeline.MediaRow(id, "image/tiff", bos.toByteArray)
      }
    }
    MediaPipeline.videoFrameNearDup(
      MediaPipeline.videoFrames(media, every = VidEvery,
        maxFrames = VidFrames))
  }

  private val videoNearDupSql = {
    val pixel = framePixelSql(m => s"md5($m)", "//", "fr.f", "idx.i")
    s"""WITH idx AS (SELECT unnest(generate_series(0, 63)) AS i),
       |fr AS (SELECT f FROM (SELECT unnest(generate_series(0, ${VidFrames - 1})) AS f)
       |       WHERE f % $VidEvery = 0),
       |px AS (
       |  SELECT d.doc_id, fr.f, idx.i,
       |         $pixel AS v
       |  FROM documents d CROSS JOIN fr CROSS JOIN idx),
       |m AS (SELECT doc_id, f, CAST(sum(v) AS BIGINT) // 64 AS mean
       |      FROM px GROUP BY 1, 2),
       |bits AS (
       |  SELECT p.doc_id, p.f, p.i,
       |         CASE WHEN p.v >= m.mean THEN 1 ELSE 0 END AS b
       |  FROM px p JOIN m ON p.doc_id = m.doc_id AND p.f = m.f),
       |bands AS (
       |  SELECT doc_id, f, i // 8 AS band,
       |         CAST(sum(b * (1 << (i % 8))) AS BIGINT) AS key
       |  FROM bits GROUP BY 1, 2, 3),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, x.f AS frame_a,
       |                  y.doc_id AS doc_b, y.f AS frame_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |ham AS (
       |  SELECT c.doc_a, c.frame_a, c.doc_b, c.frame_b,
       |         CAST(sum(CASE WHEN ba.b <> bb.b THEN 1 ELSE 0 END) AS INTEGER) AS hamming
       |  FROM cand c
       |  JOIN bits ba ON ba.doc_id = c.doc_a AND ba.f = c.frame_a
       |  JOIN bits bb ON bb.doc_id = c.doc_b AND bb.f = c.frame_b AND bb.i = ba.i
       |  GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, CAST(frame_a AS INTEGER) AS frame_a,
       |       doc_b, CAST(frame_b AS INTEGER) AS frame_b, hamming
       |FROM ham WHERE hamming <= 7
       |ORDER BY doc_a, frame_a, doc_b, frame_b""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_multimodal_features" -> binaryFeatures,
    "q120_frame_energy" -> frameEnergy,
    "q163_image_near_dup" -> imageNearDupPairs,
    "q165_video_near_dup" -> videoNearDupPairs)

  override def oracles: Map[String, String] = Map(
    "q39_multimodal_features" -> binaryFeaturesSql,
    "q120_frame_energy" -> frameEnergySql,
    "q163_image_near_dup" -> imageNearDupSql,
    "q165_video_near_dup" -> videoNearDupSql)
}
