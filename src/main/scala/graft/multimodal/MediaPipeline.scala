package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: media as opaque binary payloads with
  * typed metadata, decoded/feature-extracted in partition-local
  * batches via mapPartitions (the Scala analogue of mapInPandas batch
  * UDFs: amortize per-batch setup — the codec is initialized once per
  * partition, not per row).
  *
  * Two codec tiers:
  *  - IMAGE payloads decode for REAL via the JDK's `javax.imageio`
  *    (PNG/JPEG/GIF/BMP readers ship with every JRE — no external
  *    library): width/height/luma-pixel extraction in `decodeImage`,
  *    batch-distributed in `decodeAll`.
  *  - everything else (audio/video/unknown — no codec libs in this
  *    container) falls back to `fakeDecode`, a clearly-marked
  *    deterministic byte-level stand-in.
  * Everything around the codec (schema, batch shape, partition
  * parallelism, output columns) is the real production plumbing and
  * is spec-tested (MediaPipelineSpec).
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

  /** REAL image decode via the JDK's javax.imageio. Returns
    * (width, height, luma) — one 0..255 gray value per pixel,
    * row-major, via the integer ITU-R BT.601 weighting — or None when
    * no registered ImageReader recognizes the payload (or it is
    * corrupt): callers fall back to the deterministic stub. Bulk
    * getRGB, not per-pixel calls (one int[] copy per image). */
  def decodeImage(payloadOrNull: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (payloadOrNull == null || payloadOrNull.isEmpty) None
    else try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payloadOrNull))).map(lumaOf)
    } catch {
      // NonFatal, not just IOException: JDK ImageIO readers throw
      // RuntimeExceptions (ArrayIndexOutOfBounds, IllegalArgument,
      // CMMException…) on malformed-but-recognized payloads, and a
      // crawled corpus WILL contain those — they must fall back to
      // the stub, not kill the task
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Box-sample an arbitrary w×h pixel grid to side×side (top-left
    * sample per box, fakeResize's policy — a production codec would
    * average the box; the fixed output shape is the contract). */
  def sampleGrid(px: Array[Int], w: Int, h: Int, side: Int): Array[Int] =
    Array.tabulate(side * side) { i =>
      val (r, c) = (i / side, i % side)
      val idx = (r * h / side) * w + (c * w / side)
      if (idx >= 0 && idx < px.length) px(idx) else 0
    }

  case class DecodedMedia(doc_id: Long, mime: String, byte_len: Int,
    decoded: Boolean, width: Int, height: Int, mean_luma: Double,
    frame_sample: Array[Int])

  /** Partition-local batch decode with the REAL image codec: imageio
    * for payloads its readers recognize (decoded=true: true
    * dimensions, mean luma, fixed side×side luma sample), the
    * deterministic stub otherwise (decoded=false: zero dimensions,
    * stub frame sample) — so one pass classifies and featurizes a
    * mixed media column without failing on the formats this
    * environment cannot decode. */
  def decodeAll(media: Dataset[MediaRow], side: Int = 8): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init: byte-array decodes must not spill
      // through ImageIO's default disk-backed stream cache
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val len = if (r.payload == null) 0 else r.payload.length
        decodeImage(r.payload) match {
          case Some((w, h, luma)) =>
            val mean =
              if (luma.isEmpty) 0.0
              else luma.foldLeft(0L)(_ + _).toDouble / luma.length
            DecodedMedia(r.doc_id, r.mime, len, decoded = true, w, h, mean,
              sampleGrid(luma, w, h, side))
          case None =>
            val (_, frames) = fakeDecode(r.payload)
            DecodedMedia(r.doc_id, r.mime, len, decoded = false, 0, 0, 0.0, frames)
        }
      }
    }
  }

  /** 64-bit average hash (aHash) of an 8×8 luma grid: bit i set when
    * pixel i is at or above the integer mean — the classic perceptual
    * image fingerprint (robust to re-encode/resize/small edits, which
    * change bytes but not the coarse luma layout, so exact byte-hash
    * dedup misses them). Pure integer arithmetic: deterministic
    * across JVMs and engines. */
  def avgHash64(px: Array[Int]): Long = {
    require(px.length == 64, s"aHash needs an 8x8 grid, got ${px.length}")
    val mean = px.foldLeft(0L)(_ + _.toLong) / 64
    px.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v >= mean) acc | (1L << i) else acc
    }
  }

  case class ImageHash(doc_id: Long, phash: Long, decoded: Boolean)

  /** Perceptual hash per media row: REAL-decoded images hash their
    * 8×8 luma sample; undecodable payloads are marked (decoded=false,
    * hash of the stub sample padded/truncated to 64) so callers can
    * exclude them from visual dedup. */
  def imageHashes(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    decodeAll(media, 8).map(d =>
      ImageHash(d.doc_id, avgHash64(d.frame_sample.padTo(64, 0).take(64)),
        d.decoded))
  }

  /** Image near-duplicate pairs by perceptual hash: the visual twin of
    * the text MinHash+LSH pipeline (q21-q23), with a guarantee the
    * probabilistic bands don't have — banding a 64-bit hash into 8
    * bytes and joining bucket-local means any pair within Hamming
    * distance ≤ 7 MUST collide on at least one unchanged band
    * (pigeonhole: 7 flipped bits cannot touch all 8 bands), so recall
    * at the default threshold is EXACT, not probabilistic. Candidates
    * then verify with one integer popcount. Scale: same shape as the
    * text LSH — one explode (8 rows per image), a bucket-keyed
    * self-join (never all-pairs), candidate-bounded verification. */
  def imageNearDup(hashes: Dataset[ImageHash], maxHamming: Int = 7): DataFrame = {
    require(maxHamming <= 7,
      "banded recall is exact only for maxHamming <= 7 (8 bands)")
    val h = hashes.filter(_.decoded).toDF()
    val bands = h.select(col("doc_id"), col("phash"),
      explode(array((0 until 8).map(i => struct(lit(i).as("band"),
        shiftright(col("phash"), i * 8).bitwiseAND(lit(0xffL)).as("key"))): _*)).as("b"))
      .select(col("doc_id"), col("phash"), col("b.band").as("band"), col("b.key").as("key"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.phash").as("ha"), col("y.phash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Cross-video FRAME near-duplicate pairs by perceptual hash — the
    * multi-frame twin of imageNearDup (q163): every decoded, kept
    * frame's 64-bit aHash bands into 8 bytes, bucket-local join across
    * DIFFERENT videos (doc_a < doc_b — within-video redundancy is the
    * scene-cut sampler's job, not dedup's), popcount verify at
    * Hamming ≤ maxHamming. The pigeonhole recall guarantee carries
    * over unchanged: ≤ 7 flipped bits cannot touch all 8 bands, so a
    * re-encoded clip's frames MUST collide with their originals.
    * Scale: 8 rows per kept frame, bucket-keyed join (never
    * all-pairs), candidate-bounded verification — the q21-q23 LSH
    * shape with exact recall. */
  def videoFrameNearDup(frames: Dataset[VideoFrameRow],
      maxHamming: Int = 7): DataFrame = {
    require(maxHamming <= 7,
      "banded recall is exact only for maxHamming <= 7 (8 bands)")
    val h = frames.filter(_.decoded).toDF()
      .select(col("doc_id"), col("frame_idx"), col("ahash"))
    val bands = h.select(col("doc_id"), col("frame_idx"), col("ahash"),
      explode(array((0 until 8).map(i => struct(lit(i).as("band"),
        shiftright(col("ahash"), i * 8).bitwiseAND(lit(0xffL)).as("key"))): _*)).as("b"))
      .select(col("doc_id"), col("frame_idx"), col("ahash"),
        col("b.band").as("band"), col("b.key").as("key"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.frame_idx").as("frame_a"),
        col("y.doc_id").as("doc_b"), col("y.frame_idx").as("frame_b"),
        col("x.ahash").as("ha"), col("y.ahash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("frame_a"), col("doc_b"), col("frame_b"),
        col("hamming"))
      // per-partition sort (guide §2.4, the q04 rule): pair rows scale
      // with the planted-clip population; the compare gates are
      // row-order-insensitive
      .sortWithinPartitions(col("doc_a"), col("frame_a"), col("doc_b"), col("frame_b"))
  }

  /** BT.601 integer luma plane of a decoded image — shared by the
    * single-image and multi-frame decode paths. */
  private def lumaOf(img: java.awt.image.BufferedImage): (Int, Int, Array[Int]) = {
    val w = img.getWidth
    val h = img.getHeight
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    val luma = new Array[Int](w * h)
    var i = 0
    while (i < luma.length) {
      val v = rgb(i)
      luma(i) = (((v >> 16) & 0xff) * 299 + ((v >> 8) & 0xff) * 587 +
        (v & 0xff) * 114) / 1000
      i += 1
    }
    (w, h, luma)
  }

  /** REAL multi-frame decode — the video-container tier: javax.imageio
    * sequence readers (TIFF multi-page and GIF multi-frame ship with
    * the JDK) enumerate and decode every frame up to `maxFrames`,
    * returning per-frame (width, height, luma). None when no reader
    * recognizes the payload or it holds no frames (callers fall back
    * to the stub — the decodeImage/decodeAudio contract). A
    * single-frame image is a 1-frame "video", so one code path serves
    * both. Note: frames decode as stored — animated-GIF disposal
    * compositing is out of scope (TIFF is the canonical multi-frame
    * container here). */
  def decodeFrames(payloadOrNull: Array[Byte],
      maxFrames: Int = 64): Option[Seq[(Int, Int, Array[Int])]] = {
    if (payloadOrNull == null || payloadOrNull.isEmpty) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payloadOrNull))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            // seekForwardOnly=false: getNumImages(true) must scan
            reader.setInput(iis, false, true)
            val n = math.min(reader.getNumImages(true), maxFrames)
            if (n <= 0) None
            else Some((0 until n).map(i => lumaOf(reader.read(i))))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch {
      // same malformed-payload tier as decodeImage/decodeAudio
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Hamming distance above which two consecutive sampled frames'
    * aHashes count as a scene cut (64-bit hash; >16 differing bits is
    * far outside re-encode noise, the q118-family dup threshold
    * inverted). */
  val SceneCutHamming = 16

  case class VideoFrameRow(doc_id: Long, mime: String, decoded: Boolean,
    n_frames: Int, frame_idx: Int, width: Int, height: Int,
    mean_luma: Double, ahash: Long, scene_change: Boolean)

  /** Partition-local batch video featurization: REAL multi-frame
    * decode, then the frame-sampling pass every video curation
    * pipeline runs — keep every `every`-th frame, and per kept frame
    * emit dimensions, mean luma, the 64-bit perceptual aHash (the
    * q118-family visual fingerprint, enabling cross-video frame dedup
    * downstream), and a scene-change flag (aHash Hamming vs the
    * previously KEPT frame > SceneCutHamming — the shot-boundary
    * signal a sampler uses to keep one frame per shot instead of N
    * near-identical ones). Undecodable payloads fall back to ONE
    * stub row (decoded=false, the byte-stub hash), so a mixed media
    * column featurizes in one pass — the decodeAll/audioFrames
    * contract. No shuffle; parallelism is the input partitioning. */
  def videoFrames(media: Dataset[MediaRow], every: Int = 2,
      maxFrames: Int = 64): Dataset[VideoFrameRow] = {
    require(every > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        decodeFrames(r.payload, maxFrames) match {
          case Some(frames) =>
            var prev = -1L
            frames.zipWithIndex.collect {
              case ((w, h, luma), idx) if idx % every == 0 =>
                val hash = avgHash64(sampleGrid(luma, w, h, 8))
                val cut = prev != -1L &&
                  java.lang.Long.bitCount(prev ^ hash) > SceneCutHamming
                prev = hash
                val mean =
                  if (luma.isEmpty) 0.0
                  else luma.foldLeft(0L)(_ + _).toDouble / luma.length
                VideoFrameRow(r.doc_id, r.mime, decoded = true,
                  frames.size, idx, w, h, mean, hash, cut)
            }
          case None =>
            val (_, stub) = fakeDecode(r.payload)
            Seq(VideoFrameRow(r.doc_id, r.mime, decoded = false,
              stub.length, 0, 0, 0, 0.0,
              avgHash64(stub.padTo(64, 0).take(64)), scene_change = false))
        }
      }
    }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/
    * AU parsers + PCM converters ship with every JRE — offline-safe,
    * same tier as the imageio path): parse the payload, convert to
    * signed 16-bit little-endian PCM at the source rate/channel
    * count, return (sampleRate, channels, samples) with samples
    * interleaved by channel — or None when no parser recognizes the
    * payload (callers fall back to the byte stub, exactly the
    * decodeImage pattern). */
  def decodeAudio(payloadOrNull: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (payloadOrNull == null || payloadOrNull.isEmpty) None
    else try {
      val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payloadOrNull))
      try {
        val f = src.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
          f.getSampleRate, false)
        val pcm =
          if (f.matches(target)) src
          else javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
        val bytes = pcm.readAllBytes()
        val n = bytes.length / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          // little-endian signed 16-bit: high byte carries the sign
          samples(i) = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
          i += 1
        }
        Some((f.getSampleRate.round, f.getChannels, samples))
      } finally src.close()
    } catch {
      // UnsupportedAudioFileException on unrecognized payloads, plus
      // the same malformed-but-recognized RuntimeException tier the
      // image path guards — fall back to the stub, never kill the task
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Audio frame/hop in SAMPLES (the real-amplitude twin of the q120
    * byte constants; hop < window = overlapping frames). */
  val AudioWin = 256
  val AudioHop = 128

  /** Amplitude at/below which a 16-bit sample counts as silent
    * (~1% of full scale — the usual noise-floor gate). */
  val SilenceAmp = 327

  case class AudioFrame(doc_id: Long, mime: String, decoded: Boolean,
    sample_rate: Int, channels: Int, n_samples: Int, frame_idx: Int,
    frame_len: Int, energy: Long, peak: Long, n_silent: Long)

  /** Overlapping-frame features over a decoded sample array — q120's
    * truncated-tail count rule (ceil(max(n-W,0)/H)+1; the tail frame
    * is emitted truncated, never dropped; an empty signal is one
    * empty frame): per frame energy = Σ s² (exact integer), peak =
    * max |s|, n_silent = count(|s| <= silenceAmp). */
  def audioFrameStats(samples: Array[Int], win: Int, hop: Int,
      silenceAmp: Int): IndexedSeq[(Int, Int, Long, Long, Long)] = {
    val n = samples.length
    val frames = math.ceil(math.max(n - win, 0).toDouble / hop).toInt + 1
    (0 until frames).map { fi =>
      val from = fi * hop
      val until = math.min(from + win, n)
      var energy = 0L; var peak = 0L; var silent = 0L
      var i = from
      while (i < until) {
        val s = samples(i)
        energy += s.toLong * s.toLong
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        if (a <= silenceAmp) silent += 1
        i += 1
      }
      (fi, until - from, energy, peak, silent)
    }
  }

  /** Partition-local batch audio featurization with the REAL codec:
    * javax.sound.sampled for payloads its parsers recognize
    * (decoded=true: true sample rate/channels, frame features over
    * real amplitudes), the byte stub otherwise (decoded=false: the
    * payload's unsigned bytes stand in as the "signal", silence =
    * the q120 space-byte rule) — one pass featurizes a mixed media
    * column without failing on undecodable rows, exactly decodeAll's
    * image contract. One output row per (doc, frame); no shuffle —
    * parallelism is the input partitioning. */
  def audioFrames(media: Dataset[MediaRow], win: Int = AudioWin,
      hop: Int = AudioHop): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudio(r.payload) match {
          case Some((rate, ch, samples)) =>
            audioFrameStats(samples, win, hop, SilenceAmp).map {
              case (fi, flen, energy, peak, silent) =>
                AudioFrame(r.doc_id, r.mime, decoded = true, rate, ch,
                  samples.length, fi, flen, energy, peak, silent)
            }
          case None =>
            val payload = if (r.payload == null) Array.emptyByteArray else r.payload
            val bytes = payload.map(_ & 0xff)
            audioFrameStats(bytes, win, hop, silenceAmp = -1).map {
              case (fi, flen, energy, peak, _) =>
                val silent = (fi * hop until math.min(fi * hop + win, bytes.length))
                  .count(i => bytes(i) == 32).toLong
                AudioFrame(r.doc_id, r.mime, decoded = false, 0, 0,
                  bytes.length, fi, flen, energy, peak, silent)
            }
        }
      }
    }
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
