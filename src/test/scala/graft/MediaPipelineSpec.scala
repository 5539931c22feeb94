package graft

import graft.multimodal.MediaPipeline

/** The mapPartitions media plumbing agrees with the column-wise
  * q39 features, and the batch decode is deterministic. */
class MediaPipelineSpec extends SparkSpec {

  test("mapPartitions features match column-wise q39 incl. frame counts") {
    val docs = Tables.t(spark, sf0001, "documents")
    val viaPartitions = MediaPipeline.extractFeatures(MediaPipeline.fromDocuments(docs))
      .select("doc_id", "byte_len", "checksum64", "n_frames")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getInt(3).toLong))
    val viaColumns = graft.operators.Multimodal.binaryFeatures(spark, sf0001)
      .select("doc_id", "byte_len", "checksum64", "n_frames")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
    assert(viaPartitions.toSeq == viaColumns.toSeq)
  }

  test("frame count is floor(len/256)+1, like the column-wise twin") {
    val bytes = Array.fill[Byte](700)(65)
    val (_, frames) = MediaPipeline.fakeDecode(bytes)
    assert(frames.length == 3) // offsets 0, 256, 512
    assert(frames.forall(_ == 65))
    // exact multiples count the final empty partial frame (0-padded)
    assert(MediaPipeline.fakeDecode(Array.fill[Byte](256)(1))._2.toSeq == Seq(1, 0))
    assert(MediaPipeline.fakeDecode(Array.empty[Byte])._2.toSeq == Seq(0))
    assert(MediaPipeline.fakeDecode(null)._2.toSeq == Seq(0)) // null = empty media
  }

  test("resize: fixed-size output grid regardless of payload length") {
    val docs = Tables.t(spark, sf0001, "documents")
    val resized = MediaPipeline.resizeAll(MediaPipeline.fromDocuments(docs), side = 8)
    val rows = resized.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.width == 8 && r.height == 8 && r.pixels.length == 64))
    // deterministic: same input -> same grid
    val again = MediaPipeline.resizeAll(MediaPipeline.fromDocuments(docs), side = 8)
      .collect().map(r => r.doc_id -> r.pixels.toSeq).toMap
    rows.foreach(r => assert(again(r.doc_id) == r.pixels.toSeq))
    // empty payload pads with zeros, never throws; single-byte payload
    // broadcasts its one source box to the whole grid
    assert(MediaPipeline.fakeResize(Array.empty[Byte], 8).forall(_ == 0))
    assert(MediaPipeline.fakeResize(Array[Byte](7), 8).forall(_ == 7))
  }

  test("real PNG/JPEG decode via javax.imageio inside the batch seam") {
    import java.awt.image.BufferedImage
    // gray ramp: r=g=b=v makes the BT.601 luma exactly v — decode is
    // verifiable pixel-for-pixel
    val img = new BufferedImage(16, 9, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 16) {
      val v = x * 16 + y
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def encode(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val png = encode("png")
    // direct decode: exact dimensions and exact luma (PNG is lossless)
    val Some((w, h, luma)) = MediaPipeline.decodeImage(png)
    assert(w == 16 && h == 9 && luma.length == 144)
    assert(luma(0) == 0 && luma(1) == 16 && luma(16) == 1) // (0,0) (1,0) (0,1)
    // JPEG decodes too (lossy — dimensions only)
    val Some((jw, jh, _)) = MediaPipeline.decodeImage(encode("jpg"))
    assert(jw == 16 && jh == 9)
    // through the distributed batch seam, mixed with a non-image
    // payload that falls back to the stub
    import spark.implicits._
    val textBytes = "not an image".getBytes("UTF-8")
    val ds = Seq(
      MediaPipeline.MediaRow(1L, "image/png", png),
      MediaPipeline.MediaRow(2L, "text/plain", textBytes)).toDS()
    val out = MediaPipeline.decodeAll(ds).collect().sortBy(_.doc_id)
    assert(out(0).decoded && out(0).width == 16 && out(0).height == 9)
    assert(out(0).frame_sample.length == 64) // fixed side×side contract
    assert(math.abs(out(0).mean_luma - luma.sum.toDouble / 144) < 1e-9)
    assert(!out(1).decoded && out(1).width == 0 && out(1).height == 0)
    assert(out(1).frame_sample.toSeq == MediaPipeline.fakeDecode(textBytes)._2.toSeq)
    // corrupt-but-prefixed payload falls back, never throws
    assert(MediaPipeline.decodeImage(png.take(20)).isEmpty)
  }

  test("perceptual hash: re-encoded/edited images pair, distinct images don't") {
    import java.awt.image.BufferedImage
    import spark.implicits._
    // A: left half black, right half white — aHash bits far from the
    // mean, stable under small edits. B: A with a few pixels flipped
    // deep inside each half (visual near-dup). C: A inverted (every
    // hash bit flips — maximally distant).
    def halves(invert: Boolean, noise: Boolean): Array[Byte] = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val white = (x >= 32) ^ invert
        img.setRGB(x, y, if (white) 0xffffff else 0x000000)
      }
      if (noise) for ((x, y) <- Seq((2, 2), (60, 60), (10, 50)))
        img.setRGB(x, y, 0x808080)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaPipeline.MediaRow(1L, "image/png", halves(invert = false, noise = false)),
      MediaPipeline.MediaRow(2L, "image/png", halves(invert = false, noise = true)),
      MediaPipeline.MediaRow(3L, "image/png", halves(invert = true, noise = false)),
      MediaPipeline.MediaRow(4L, "text/plain", "not an image".getBytes("UTF-8"))).toDS()
    val hashes = MediaPipeline.imageHashes(rows)
    val pairs = MediaPipeline.imageNearDup(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"expected exactly the near-dup pair (1,2): $pairs")
    assert(pairs.head._3 <= 7)
    // the undecodable payload is excluded from visual dedup
    assert(hashes.collect().find(_.doc_id == 4L).exists(!_.decoded))
  }

  test("banded blocking recall is exact at hamming <= 7 (pigeonhole)") {
    import spark.implicits._
    // 7 flipped bits spread across 7 DIFFERENT bands — no identical
    // 16-bit half, but band 7 (and only band 7) survives: the pair
    // MUST still be found
    val base = 0x123456789abcdef0L
    val flipped = (0 until 7).foldLeft(base)((h, b) => h ^ (1L << (b * 8)))
    val hs = Seq(
      MediaPipeline.ImageHash(1L, base, decoded = true),
      MediaPipeline.ImageHash(2L, flipped, decoded = true)).toDS()
    val pairs = MediaPipeline.imageNearDup(hs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, 7)))
    // 8 flips touching every band: correctly outside the guarantee
    val allBands = (0 until 8).foldLeft(base)((h, b) => h ^ (1L << (b * 8)))
    val hs8 = Seq(
      MediaPipeline.ImageHash(1L, base, decoded = true),
      MediaPipeline.ImageHash(2L, allBands, decoded = true)).toDS()
    assert(MediaPipeline.imageNearDup(hs8).isEmpty)
  }

  test("decode is deterministic across invocations") {
    val bytes = "hello multimodal world".getBytes("UTF-8")
    assert(MediaPipeline.fakeDecode(bytes) == MediaPipeline.fakeDecode(bytes) ||
      (MediaPipeline.fakeDecode(bytes)._1 == MediaPipeline.fakeDecode(bytes)._1 &&
        MediaPipeline.fakeDecode(bytes)._2.toSeq == MediaPipeline.fakeDecode(bytes)._2.toSeq))
  }

  // ---- real multi-frame (video-container) decode -------------------

  /** Solid or split-pattern test frame; r=g=b makes luma exact. */
  private def frame(pattern: Int => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = pattern(x) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def tiffBytes(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    assert(it.hasNext, "JDK TIFF writer missing")
    val writer = it.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("real multi-frame TIFF decode: every frame, bit-exact luma") {
    val video = tiffBytes(Seq(frame(_ => 10), frame(_ => 200), frame(x => x)))
    val Some(frames) = MediaPipeline.decodeFrames(video)
    assert(frames.size == 3)
    assert(frames.forall { case (w, h, l) => w == 32 && h == 32 && l.length == 1024 })
    assert(frames(0)._3.forall(_ == 10) && frames(1)._3.forall(_ == 200))
    assert(frames(2)._3.take(32).toSeq == (0 until 32)) // the ramp row
    // a single-frame PNG is a 1-frame video through the same path
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(frame(_ => 77), "png", bos)
    val Some(one) = MediaPipeline.decodeFrames(bos.toByteArray)
    assert(one.size == 1 && one.head._3.forall(_ == 77))
    // unrecognized / empty payloads fall back, never throw
    assert(MediaPipeline.decodeFrames("not video".getBytes("UTF-8")).isEmpty)
    assert(MediaPipeline.decodeFrames(null).isEmpty)
  }

  test("video frame sampling + scene-change detection through the batch seam") {
    import spark.implicits._
    // shots: A A B B A A (A = left-black/right-white, B = inverted) —
    // sampling every 2 keeps frames 0(A), 2(B), 4(A): two scene cuts
    def a = frame(x => if (x >= 16) 255 else 0)
    def b = frame(x => if (x >= 16) 0 else 255)
    val video = tiffBytes(Seq(a, a, b, b, a, a))
    val ds = Seq(
      MediaPipeline.MediaRow(1L, "image/tiff", video),
      MediaPipeline.MediaRow(2L, "text/plain", "not a video".getBytes("UTF-8")))
      .toDS()
    val out = MediaPipeline.videoFrames(ds, every = 2).collect().groupBy(_.doc_id)
    val v1 = out(1L).sortBy(_.frame_idx)
    assert(v1.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(v1.forall(f => f.decoded && f.n_frames == 6 && f.width == 32))
    assert(v1.map(_.scene_change).toSeq == Seq(false, true, true))
    // A-frames hash identically (frame dedup across the video), B differs
    assert(v1(0).ahash == v1(2).ahash && v1(0).ahash != v1(1).ahash)
    assert(math.abs(v1(0).mean_luma - 127.5) < 0.5) // half 0 / half 255
    // the undecodable payload is one stub row
    val v2 = out(2L)
    assert(v2.length == 1 && !v2.head.decoded && !v2.head.scene_change)
  }

  // ---- real audio decode (javax.sound.sampled) --------------------

  private def wavBytes(samples: Array[Short], rate: Float = 8000f,
      channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      channels, channels * 2, rate, false)
    val data = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data),
      fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV decode via javax.sound.sampled is bit-exact") {
    // a ramp crossing zero plus full-scale extremes: every byte
    // pattern class (negative, zero, positive, min, max) round-trips
    val src = (Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue) ++
      (0 until 995).map(i => ((i - 500) * 60).toShort)).toArray
    val Some((rate, ch, samples)) = MediaPipeline.decodeAudio(wavBytes(src))
    assert(rate == 8000 && ch == 1)
    assert(samples.toSeq == src.map(_.toInt).toSeq)
    // stereo interleaves by channel and round-trips too
    val st = Array[Short](100, -100, 200, -200, 300, -300)
    val Some((_, ch2, s2)) = MediaPipeline.decodeAudio(wavBytes(st, channels = 2))
    assert(ch2 == 2 && s2.toSeq == st.map(_.toInt).toSeq)
    // corrupt payloads and non-audio bytes fall back, never throw
    assert(MediaPipeline.decodeAudio(wavBytes(src).take(30)).isEmpty)
    assert(MediaPipeline.decodeAudio("not audio".getBytes("UTF-8")).isEmpty)
    assert(MediaPipeline.decodeAudio(null).isEmpty)
  }

  test("audio frame features run on REAL PCM through the batch seam") {
    import spark.implicits._
    val src = (0 until 1000).map(i =>
      (math.sin(i * 0.05) * 12000).toShort).toArray
    val silent = Array.fill[Short](300)(0)
    val ds = Seq(
      MediaPipeline.MediaRow(1L, "audio/wav", wavBytes(src)),
      MediaPipeline.MediaRow(2L, "audio/wav", wavBytes(silent)),
      MediaPipeline.MediaRow(3L, "text/plain", "some text  payload".getBytes("UTF-8")))
      .toDS()
    val out = MediaPipeline.audioFrames(ds).collect().groupBy(_.doc_id)
    // doc 1: decoded, q120's truncated-tail frame-count rule over
    // SAMPLES, per-frame energy/peak exact vs a direct computation
    val f1 = out(1L).sortBy(_.frame_idx)
    assert(f1.forall(f => f.decoded && f.sample_rate == 8000 && f.channels == 1))
    val expect = MediaPipeline.audioFrameStats(src.map(_.toInt),
      MediaPipeline.AudioWin, MediaPipeline.AudioHop, MediaPipeline.SilenceAmp)
    assert(f1.length == math.ceil(math.max(1000 - 256, 0) / 128.0).toInt + 1)
    assert(f1.length == expect.length)
    for ((f, (fi, flen, energy, peak, silent)) <- f1.zip(expect)) {
      assert(f.frame_idx == fi && f.frame_len == flen)
      assert(f.energy == energy && f.peak == peak && f.n_silent == silent)
    }
    // the tail frame is TRUNCATED, never dropped: 1000 samples, 7
    // frames, the last starting at 6·128 = 768 and holding 232
    assert(f1.last.frame_len == 232)
    // doc 2: all-zero signal — every sample silent, zero energy
    assert(out(2L).forall(f => f.decoded && f.energy == 0L &&
      f.n_silent == f.frame_len.toLong))
    // doc 3: stub fallback — byte semantics, q120's space-silence rule
    val f3 = out(3L).head
    assert(!f3.decoded && f3.sample_rate == 0 && f3.n_samples == 18)
    assert(f3.energy == "some text  payload".getBytes("UTF-8")
      .map(b => (b & 0xff).toLong).map(v => v * v).sum)
    assert(f3.n_silent == 3L)
  }

  test("q120 frames: count formula, overlap coverage, and exact energy") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.t(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = graft.operators.Multimodal.frameEnergy(spark, sf0001)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    assert(out.keySet == docs.filter(_._2.nonEmpty).keySet)
    for ((id, frames) <- out) {
      val len = docs(id).length
      val expectFrames = math.ceil(math.max(len - 64, 0) / 32.0).toInt + 1
      assert(frames.length == expectFrames,
        s"doc $id len $len: ${frames.length} frames != $expectFrames")
      // hop < window: consecutive frames overlap by window - hop bytes,
      // and together they cover every byte of the payload
      val covered = frames.map(_.getAs[Int]("frame_idx"))
        .flatMap(f => (f * 32 + 1) to math.min(f * 32 + 64, len)).toSet
      assert(covered == (1 to len).toSet, s"doc $id: frames do not cover the payload")
      for (fr <- frames) {
        val f = fr.getAs[Int]("frame_idx")
        val slice = docs(id).substring(f * 32, math.min(f * 32 + 64, len))
        assert(fr.getAs[Long]("energy") ==
          slice.map(c => c.toLong * c.toLong).sum, s"doc $id frame $f: energy")
        assert(fr.getAs[Long]("peak_byte") == slice.map(_.toLong).max)
        assert(fr.getAs[Long]("n_silent") == slice.count(_ == ' ').toLong)
      }
    }
  }
}
