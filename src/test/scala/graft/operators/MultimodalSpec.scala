package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Multimodal plumbing: schema contract, per-partition batch decode shape,
  * frame sampling — plus the REAL image decode path (JDK ImageIO readers:
  * exact dimensions, BT.601 luminance, 8x8 average-hash) with the
  * deterministic byte-derived fallback for unrecognized payloads. */
class MultimodalSpec extends SparkSpec {

  /** PNG/BMP/JPEG bytes for a solid or per-pixel-defined image. */
  private def imageBytes(w: Int, h: Int, format: String)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  private def media = {
    val docs = graft.sources.ParquetConnector
      .readTable(spark, "/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    Multimodal.syntheticMedia(docs, "doc_id", "text", "image")
  }

  test("syntheticMedia produces the media schema contract") {
    val m = media
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "uri", "payload", "meta"))
    assert(m.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    assert(m.count() == 50)
  }

  test("extractImageFeatures is deterministic and total over payloads") {
    val f1 = Multimodal.extractImageFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractImageFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 50)
    assert(f1.forall(f => f.width >= 64 && f.height >= 64))
    assert(f1.forall(f => f.mean_intensity > 0.0))
  }

  test("empty payload yields the zero-feature row, not a crash") {
    val f = Multimodal.fakeDecodeImage(7L, Array.empty[Byte])
    assert(f == Multimodal.ImageFeatures(7L, 0, 0, 0.0, 0L))
    assert(Multimodal.decodeImage(7L, Array.empty[Byte]) == f)
  }

  test("decodeImage reads real PNG/BMP bytes: exact dimensions, luminance, aHash") {
    // uniform gray 100: every cell equals the grid mean -> no aHash bit
    val gray = Multimodal.decodeImage(1L, imageBytes(16, 8, "png")((_, _) => 0x646464))
    assert(gray.width == 16 && gray.height == 8)
    assert(math.abs(gray.mean_intensity - 100.0) < 1e-9)
    assert(gray.phash == 0L)
    // left half black, right half white: grid columns 4-7 exceed the
    // mean -> the high nibble of every byte of the hash
    val split = Multimodal.decodeImage(2L,
      imageBytes(16, 8, "png")((x, _) => if (x < 8) 0x000000 else 0xffffff))
    assert(split.width == 16 && split.height == 8)
    assert(math.abs(split.mean_intensity - 127.5) < 1e-9)
    assert(split.phash == 0xF0F0F0F0F0F0F0F0L)
    // same image through a second JDK reader (BMP) decodes identically
    val bmp = Multimodal.decodeImage(3L,
      imageBytes(16, 8, "bmp")((x, _) => if (x < 8) 0x000000 else 0xffffff))
    assert(bmp.copy(media_id = 2L) == split)
  }

  test("aHash is stable across rescaling (the near-dup property)") {
    // content constant within each 8x8 cell of the IMAGE (pseudo-random
    // per cell): the same picture rendered at 64x64 and 32x32 must pool
    // to the same grid and hash identically
    def pattern(size: Int)(x: Int, y: Int): Int = {
      val cx = x * 8 / size; val cy = y * 8 / size
      val v = ((cx * 31 + cy * 17) % 7) * 36
      (v << 16) | (v << 8) | v
    }
    val big = Multimodal.decodeImage(1L, imageBytes(64, 64, "png")(pattern(64)))
    val small = Multimodal.decodeImage(2L, imageBytes(32, 32, "png")(pattern(32)))
    assert(big.phash == small.phash,
      s"rescaled phash hamming ${java.lang.Long.bitCount(big.phash ^ small.phash)}")
    assert(big.phash != 0L, "fixture must produce a non-trivial hash")
  }

  test("unrecognized payloads fall back to the deterministic byte-derived features") {
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(Multimodal.decodeImage(9L, junk) == Multimodal.fakeDecodeImage(9L, junk))
  }

  test("decoded phash feeds hammingNearDupPairs: rescaled copies pair, distinct images don't") {
    import org.apache.spark.sql.Row
    def cells(seed: Int, size: Int)(x: Int, y: Int): Int = {
      val v = (((x * 8 / size) * 31 + (y * 8 / size) * 17 + seed) % 7) * 36
      (v << 16) | (v << 8) | v
    }
    val rows = Seq(
      Row(1L, "image", "a", imageBytes(64, 64, "png")(cells(0, 64)), null),
      Row(2L, "image", "a-small", imageBytes(32, 32, "png")(cells(0, 32)), null),
      Row(3L, "image", "b", imageBytes(64, 64, "png")(cells(3, 64)), null),
      Row(4L, "image", "c", imageBytes(64, 64, "png")(cells(5, 64)), null))
    val feats = Multimodal.extractImageFeatures(df(Multimodal.mediaSchema, rows)).toDF()
    val pairs = Dedup.hammingNearDupPairs(feats, col("phash"), "media_id", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "rescaled copy must pair with its original")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L),
      s"distinct images must not pair: $pairs")
  }

  test("extractImageFeatures decodes real images end to end through Spark") {
    import org.apache.spark.sql.Row
    val rows = (0 until 8).map { i =>
      Row(i.toLong, "image", s"mem://$i",
        imageBytes(8 + i, 8, "png")((_, _) => 0x646464), null)
    }
    val m = df(Multimodal.mediaSchema, rows)
    val feats = Multimodal.extractImageFeatures(m).collect().sortBy(_.media_id)
    assert(feats.map(_.width).toSeq == (8 until 16).toSeq)
    assert(feats.forall(f => f.height == 8 && math.abs(f.mean_intensity - 100.0) < 1e-9))
  }

  /** 16-bit signed PCM WAV bytes of a sine wave. */
  private def wavBytes(rate: Float, seconds: Double, amplitude: Double,
                       hz: Double = 440.0): Array[Byte] = {
    val n = (rate * seconds).toInt
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (amplitude * math.sin(2 * math.Pi * hz * i / rate) * 32767).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeAudio reads real WAV bytes: rate, channels, duration, sine RMS") {
    val a = Multimodal.decodeAudio(1L, wavBytes(8000f, 1.0, amplitude = 0.5))
    assert(a.sample_rate == 8000 && a.channels == 1 && a.n_frames == 8000)
    assert(math.abs(a.duration_s - 1.0) < 1e-9)
    // RMS of a 0.5-amplitude sine = 0.5 / sqrt(2)
    assert(math.abs(a.rms - 0.5 / math.sqrt(2)) < 1e-3, s"rms ${a.rms}")
    // silence has zero RMS
    assert(Multimodal.decodeAudio(2L, wavBytes(8000f, 0.5, amplitude = 0.0)).rms == 0.0)
  }

  test("unrecognized audio payloads fall back to the deterministic features") {
    val junk = "not audio".getBytes("UTF-8")
    assert(Multimodal.decodeAudio(5L, junk) == Multimodal.fakeDecodeAudio(5L, junk))
    assert(Multimodal.decodeAudio(5L, Array.empty[Byte]) ==
      Multimodal.AudioFeatures(5L, 0, 0, 0L, 0.0, 0.0))
  }

  test("extractAudioFeatures decodes real WAVs end to end through Spark") {
    import org.apache.spark.sql.Row
    val rows = (1 to 4).map { i =>
      Row(i.toLong, "audio", s"mem://$i", wavBytes(8000f, i * 0.25, 0.5), null)
    }
    val feats = Multimodal.extractAudioFeatures(df(Multimodal.mediaSchema, rows))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.n_frames).toSeq == Seq(2000L, 4000L, 6000L, 8000L))
    assert(feats.forall(f => f.sample_rate == 8000 && math.abs(f.rms - 0.5 / math.sqrt(2)) < 2e-3))
  }

  test("decodeVideoFrames reads a real animated GIF: true frame count, per-frame aHash") {
    // 5 frames: black/white split frames alternating orientation so the
    // per-frame aHash is non-trivial AND palette-exact (2 colors — GIF
    // quantization cannot perturb them)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until 5) {
      val img = new java.awt.image.BufferedImage(16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 16)
        img.setRGB(x, y, if ((x < 8) == (f % 2 == 0)) 0x000000 else 0xffffff)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = out.toByteArray

    val all = Multimodal.decodeVideoFrames(1L, gif, everyN = 1)
    assert(all.map(_.frame_idx) == Seq(0, 1, 2, 3, 4), s"got $all")
    assert(all.forall(f => f.n_frames == 5 && f.width == 16 && f.height == 8))
    // even frames: right half bright -> high nibbles; odd frames inverted
    assert(all(0).ahash == 0xF0F0F0F0F0F0F0F0L, f"frame0 ${all(0).ahash}%x")
    assert(all(1).ahash == 0x0F0F0F0F0F0F0F0FL, f"frame1 ${all(1).ahash}%x")
    val sampled = Multimodal.decodeVideoFrames(1L, gif, everyN = 2)
    assert(sampled.map(_.frame_idx) == Seq(0, 2, 4))
  }

  test("unrecognized video payloads fall back to deterministic byte-derived frames") {
    val junk = "definitely not a video container".getBytes("UTF-8")
    val frames = Multimodal.decodeVideoFrames(3L, junk, everyN = 10)
    assert(frames == Multimodal.fakeDecodeVideo(3L, junk, 10))
    assert(frames.nonEmpty && frames.forall(_.n_frames == frames.head.n_frames))
    assert(Multimodal.decodeVideoFrames(3L, Array.empty[Byte], 10).isEmpty)
  }

  test("MJPEG-in-AVI decodes for real: counted frames, exact dims, sampled indices") {
    val avi = Multimodal.realAviBytes(16, 12, frames = 5, gray0 = 40)
    val all = Multimodal.decodeVideoFrames(1L, avi, everyN = 1)
    assert(all.size == 5 && all.forall(f => f.n_frames == 5 && f.width == 16 && f.height == 12),
      all.toString)
    // quality-1.0 solid frames survive the DCT exactly: every aHash grid
    // cell equals the mean, so no bit sets
    assert(all.forall(_.ahash == 0L), all.map(_.ahash).toString)
    val sampled = Multimodal.decodeVideoFrames(1L, avi, everyN = 2)
    assert(sampled.map(_.frame_idx) == Seq(0, 2, 4))
  }

  test("AVI frame aHash has the striped closed form (per-frame hashing is real)") {
    // one 16x16 frame, left half black / right half white: halves align
    // with JPEG blocks so quality 1.0 keeps them exact; each aHash cell
    // is a 2x2 pixel box -> bright columns 4..7 per row -> 0xF0 per row
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 16).foreach(x =>
      img.setRGB(x, y, if (x < 8) 0x000000 else 0xffffff)))
    val avi = Multimodal.aviFromJpegs(16, 16, Seq(Multimodal.jpegBytes(img)))
    val fs = Multimodal.decodeVideoFrames(9L, avi, everyN = 1)
    assert(fs.size == 1 && fs.head.n_frames == 1)
    assert(fs.head.ahash == 0xF0F0F0F0F0F0F0F0L, fs.head.ahash.toHexString)
  }

  test("dirty AVI containers stay total: truncated falls back, junk frames skip") {
    val avi = Multimodal.realAviBytes(16, 12, frames = 5, gray0 = 40)
    // truncated mid-header: still RIFF/AVI magic, but no complete movi ->
    // the deterministic byte-derived fallback (scan never throws)
    val truncated = avi.take(40)
    assert(Multimodal.decodeVideoFrames(3L, truncated, 2) ==
      Multimodal.fakeDecodeVideo(3L, truncated, 2))
    // valid container, garbage JPEG payload: the frame is counted but
    // skipped on decode failure (the GIF path's convention)
    val junkFrame = Multimodal.aviFromJpegs(8, 8, Seq(Array.fill[Byte](64)(0x5a)))
    assert(Multimodal.decodeVideoFrames(4L, junkFrame, 1).isEmpty)
  }

  /** Binary-patch helper: the payload offset of the first `fourcc` box
    * header in `b` (i.e. the index OF the fourcc), -1 if absent. */
  private def findFourcc(b: Array[Byte], cc: String): Int = {
    val pat = cc.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    b.indices.find(i => i + 4 <= b.length &&
      b(i) == pat(0) && b(i + 1) == pat(1) && b(i + 2) == pat(2) && b(i + 3) == pat(3))
      .getOrElse(-1)
  }

  test("MJPEG-in-MP4 decodes for real: counted samples, exact dims, sampled indices") {
    val jpegs = (0 until 5).map { f =>
      val img = new java.awt.image.BufferedImage(16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = (40 + f * 16) & 0xff
      (0 until 12).foreach(y => (0 until 16).foreach(x =>
        img.setRGB(x, y, (g << 16) | (g << 8) | g)))
      Multimodal.jpegBytes(img)
    }
    val mp4 = Multimodal.mp4FromJpegs(16, 12, jpegs)
    val all = Multimodal.decodeVideoFrames(1L, mp4, everyN = 1)
    assert(all.size == 5 && all.forall(f => f.n_frames == 5 && f.width == 16 && f.height == 12),
      all.toString)
    assert(all.forall(_.ahash == 0L), all.map(_.ahash).toString)
    val sampled = Multimodal.decodeVideoFrames(1L, mp4, everyN = 2)
    assert(sampled.map(_.frame_idx) == Seq(0, 2, 4))
    // the probe: counted samples, ceil(n/2) planted sync samples,
    // timescale/duration from mdhd, codec+dims from the stsd entry
    val p = Multimodal.probeMp4(7L, mp4)
    assert(p == Multimodal.Mp4Probe(7L, ok = true, 5, 3, 30, 5.0 / 30.0, "jpeg", 16, 12), p)
  }

  test("MP4 probe counts table entries, never the stsz/stss header claims") {
    val mp4 = Multimodal.mp4FromJpegs(16, 12, (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 12).foreach(y => (0 until 16).foreach(x => img.setRGB(x, y, 0x808080)))
      Multimodal.jpegBytes(img)
    })
    // inflate stsz's claimed sample_count to 103: only 3 size entries
    // exist, so the counted total must stay 3 (dirty files lie in the
    // header fields, not in the tables)
    val lying = mp4.clone()
    val szAt = findFourcc(lying, "stsz")
    assert(szAt > 0)
    val claimAt = szAt + 4 + 8 // fourcc + (version/flags + sample_size)
    lying(claimAt) = 0; lying(claimAt + 1) = 0; lying(claimAt + 2) = 0
    lying(claimAt + 3) = 103.toByte
    assert(Multimodal.probeMp4(1L, lying).n_samples == 3)
    // erase stss (flip its fourcc): every sample counts as a keyframe
    val noSync = mp4.clone()
    val ssAt = findFourcc(noSync, "stss")
    assert(ssAt > 0)
    noSync(ssAt) = 'f'.toByte; noSync(ssAt + 1) = 'r'.toByte
    noSync(ssAt + 2) = 'e'.toByte; noSync(ssAt + 3) = 'e'.toByte
    assert(Multimodal.probeMp4(1L, noSync).n_keyframes == 3)
  }

  test("dirty MP4 containers stay total: truncated probes ok=false, frames fall back") {
    val mp4 = Multimodal.mp4FromJpegs(16, 12,
      Seq(Multimodal.jpegBytes(new java.awt.image.BufferedImage(
        16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB))))
    val truncated = mp4.take(16) // ftyp magic survives, no moov
    assert(Multimodal.probeMp4(2L, truncated) ==
      Multimodal.Mp4Probe(2L, ok = false, 0, 0, 0, 0.0, "", 0, 0))
    assert(Multimodal.decodeVideoFrames(2L, truncated, 2) ==
      Multimodal.fakeDecodeVideo(2L, truncated, 2))
    // garbage bytes probe false too, and null payloads never throw
    assert(!Multimodal.probeMp4(3L, Array.fill[Byte](64)(0x21)).ok)
    assert(!Multimodal.probeMp4(4L, null).ok)
    // valid container, undecodable sample payloads (an H.264-shaped
    // case): the walk still counts samples — the probe stays real —
    // while the frame surface skips what it cannot decode
    val opaque = Multimodal.mp4FromJpegs(16, 12, Seq(Array.fill[Byte](64)(0x5a)))
    assert(Multimodal.probeMp4(5L, opaque).n_samples == 1)
    assert(Multimodal.decodeVideoFrames(5L, opaque, 1).isEmpty)
  }

  test("WebM probe reads counted blocks/keyframes, Info timing, and the video TrackEntry") {
    val webm = Multimodal.webmBytes(16, 12, nBlocks = 5)
    val p = Multimodal.probeWebm(7L, webm)
    // 5 blocks, even indices keyframed (3), timescale 10⁶ ns, duration
    // 5·40 ms, codec/dims from the TrackEntry
    assert(p == Multimodal.WebmProbe(7L, ok = true, 5, 3, 1000000L, 200L, "V_VP8", 16, 12), p)
    // the live-streaming shape: unknown-size Segment AND Cluster VINTs
    // (RFC 8794 all-ones sizes) must parse to the same counted readout
    val streamed = Multimodal.webmBytes(16, 12, nBlocks = 5, unknownSizes = true)
    assert(Multimodal.probeWebm(8L, streamed) ==
      Multimodal.WebmProbe(8L, ok = true, 5, 3, 1000000L, 200L, "V_VP8", 16, 12))
    // the BlockGroup long form: frames count as blocks; keyframe iff the
    // group carries no ReferenceBlock (odd indices do — inter-coded)
    val grouped = Multimodal.webmBytes(16, 12, nBlocks = 5, blockGroups = true)
    assert(Multimodal.probeWebm(9L, grouped) ==
      Multimodal.WebmProbe(9L, ok = true, 5, 3, 1000000L, 200L, "V_VP8", 16, 12))
    // multiple KNOWN-size clusters: split must not change counts
    val multi = Multimodal.webmBytes(16, 12, nBlocks = 6, nClusters = 3)
    assert(Multimodal.probeWebm(10L, multi) ==
      Multimodal.WebmProbe(10L, ok = true, 6, 3, 1000000L, 240L, "V_VP8", 16, 12))
    // the RFC 8794 §6.2 termination case: back-to-back UNKNOWN-size
    // Clusters (real live streams) — each cluster must end where the
    // next Cluster ID begins, so blocks in clusters 2..n still count
    // (the old run-to-parent-end rule folded them into cluster 1 and
    // dropped them)
    val multiStreamed = Multimodal.webmBytes(16, 12, nBlocks = 6,
      unknownSizes = true, nClusters = 3)
    assert(Multimodal.probeWebm(11L, multiStreamed) ==
      Multimodal.WebmProbe(11L, ok = true, 6, 3, 1000000L, 240L, "V_VP8", 16, 12))
    // BlockGroup long form across unknown-size clusters exercises the
    // A0/A1/FB IDs in the valid-child set
    val multiGrouped = Multimodal.webmBytes(16, 12, nBlocks = 6,
      unknownSizes = true, blockGroups = true, nClusters = 2)
    assert(Multimodal.probeWebm(12L, multiGrouped) ==
      Multimodal.WebmProbe(12L, ok = true, 6, 3, 1000000L, 240L, "V_VP8", 16, 12))
  }

  test("dirty WebM containers stay total: truncated/garbage/null probe ok=false") {
    val webm = Multimodal.webmBytes(16, 12, nBlocks = 3)
    val truncated = webm.take(16) // EBML magic survives, no Segment tree
    assert(Multimodal.probeWebm(2L, truncated) ==
      Multimodal.WebmProbe(2L, ok = false, 0, 0, 0L, 0L, "", 0, 0))
    assert(!Multimodal.probeWebm(3L, Array.fill[Byte](64)(0x21)).ok)
    assert(!Multimodal.probeWebm(4L, null).ok)
    // blocks of a NON-video track must not count: flip the TrackType
    // byte to 2 (audio) — no video track, probe false (the walk never
    // invents a track)
    val audioOnly = webm.clone()
    // TrackType element is id 0x83, size VINT 0x40 0x01, value 1 —
    // locate the 4-byte pattern and flip the value byte
    val at = audioOnly.indices.indexWhere(i => i + 3 < audioOnly.length &&
      (audioOnly(i) & 0xff) == 0x83 && (audioOnly(i + 1) & 0xff) == 0x40 &&
      (audioOnly(i + 2) & 0xff) == 0x01 && (audioOnly(i + 3) & 0xff) == 0x01)
    assert(at > 0)
    audioOnly(at + 3) = 2
    assert(!Multimodal.probeWebm(5L, audioOnly).ok)
  }

  test("MP3 probe counts complete frames through ID3 tags; dirty payloads stay total") {
    val mp3 = Multimodal.mp3Bytes(nFrames = 5)
    // 5 counted frames, 32kHz joint stereo at 128kbps, 36ms per frame;
    // the ID3v2 front tag is skipped via its syncsafe size and the
    // ID3v1 TAG trailer ends the walk without inventing a frame
    assert(Multimodal.probeMp3(7L, mp3) ==
      Multimodal.Mp3Probe(7L, ok = true, 5, 32000, 2, 128, 180L))
    // an incomplete tail frame is NOT counted (complete frames only)
    val clipped = mp3.take(mp3.length - 128 - 3 - 100) // TAG block + 100 frame bytes
    assert(Multimodal.probeMp3(8L, clipped).n_frames == 4)
    // junk before the first sync resyncs; junk instead of audio fails
    val padded = Array.fill[Byte](37)(0x13) ++ Multimodal.mp3Bytes(3)
    assert(Multimodal.probeMp3(9L, padded).n_frames == 3)
    assert(!Multimodal.probeMp3(2L, mp3.take(8)).ok)
    assert(!Multimodal.probeMp3(3L, Array.fill[Byte](64)(0x21)).ok)
    assert(!Multimodal.probeMp3(4L, null).ok)
  }

  test("Ogg probe counts pages and lacing packets; Opus granules subtract pre-skip") {
    val ogg = Multimodal.oggBytes(nPages = 4)
    // BOS + 4 data pages, 1 + 4·2 packets, 4·3200 samples at 32kHz
    assert(Multimodal.probeOgg(7L, ogg) ==
      Multimodal.OggProbe(7L, ok = true, 5, 9, "vorbis", 32000, 400L))
    // a truncated final page keeps the counted prefix (complete pages
    // only) and the last COMPLETE page's granule
    val clipped = ogg.take(ogg.length - 10)
    val c = Multimodal.probeOgg(8L, clipped)
    assert(c.ok && c.n_pages == 4 && c.duration_ms == 300L, c.toString)
    // dirty/garbage/null fall back to the ok=false zero row
    assert(!Multimodal.probeOgg(2L, ogg.take(8)).ok)
    assert(!Multimodal.probeOgg(3L, Array.fill[Byte](64)(0x21)).ok)
    assert(!Multimodal.probeOgg(4L, null).ok)
    // OpusHead BOS: rate pins to the 48kHz granule clock, pre-skip
    // subtracts from the final granule
    val opus = ogg.clone()
    // rewrite the BOS payload in place: "OpusHead" + ver/ch + preskip
    // 960 LE at offset 10 (the id header is 30 bytes, enough room)
    val bos = "OpusHead".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val dataStart = 27 + 1 // one segment in the BOS page
    bos.indices.foreach(i => opus(dataStart + i) = bos(i))
    opus(dataStart + 10) = (960 & 0xff).toByte
    opus(dataStart + 11) = ((960 >> 8) & 0xff).toByte
    val o = Multimodal.probeOgg(9L, opus)
    assert(o.codec == "opus" && o.sample_rate == 48000 &&
      o.duration_ms == (4 * 3200 - 960) * 1000L / 48000, o.toString)
  }

  test("a custom decoder plugs into the extractVideoFrames SPI seam") {
    // the pluggable-decoder contract: any (id, bytes, everyN) =>
    // Seq[FrameFeatures] slots in without touching the Spark plumbing —
    // this stands in for a production JNI/ffmpeg decoder
    import org.apache.spark.sql.Row
    val rows = (0 until 4).map(i => Row(i.toLong, "video", s"mem://$i",
      Array[Byte](1, 2, 3, i.toByte), null))
    val custom: (Long, Array[Byte], Int) => Seq[Multimodal.FrameFeatures] =
      (id, bytes, everyN) =>
        (0 until bytes.length by math.max(everyN, 1)).map(idx =>
          Multimodal.FrameFeatures(id, bytes.length, idx, 2, 2, id * 1000L + idx))
    val out = Multimodal.extractVideoFrames(
        df(Multimodal.mediaSchema, rows), everyN = 2, decoder = custom)
      .collect().groupBy(_.media_id)
    (0 until 4).foreach { i =>
      val fs = out(i.toLong).sortBy(_.frame_idx)
      assert(fs.map(_.frame_idx).toSeq == Seq(0, 2))
      assert(fs.forall(f => f.n_frames == 4 && f.width == 2))
      assert(fs.head.ahash == i * 1000L)
    }
  }

  test("extractVideoFrames decodes real GIFs end to end through Spark") {
    import org.apache.spark.sql.Row
    val rows = (0 until 6).map { i =>
      Row(i.toLong, "video", s"mem://$i",
        Multimodal.realGifBytes(8, 8, frames = 2 + i % 4, gray0 = 40 + i), null)
    }
    val fv = Multimodal.extractVideoFrames(df(Multimodal.mediaSchema, rows), everyN = 2)
      .collect().groupBy(_.media_id)
    (0 until 6).foreach { i =>
      val n = 2 + i % 4
      val fs = fv(i.toLong).sortBy(_.frame_idx)
      assert(fs.head.n_frames == n, s"media $i: ${fs.toSeq}")
      assert(fs.map(_.frame_idx).toSeq == (0 until n by 2).toSeq)
    }
  }

  test("syntheticRealMedia payloads decode through the REAL paths with closed-form features") {
    val docs = graft.sources.ParquetConnector
      .readTable(spark, "/root/testdata/sf0.001/documents.parquet").limit(30)
    val img = Multimodal.extractImageFeatures(
      Multimodal.syntheticRealMedia(docs, "doc_id", "image")).collect()
    img.foreach { f =>
      val id = f.media_id
      assert(f.width == 8 + (id % 9).toInt && f.height == 8 + (id % 5).toInt,
        s"real PNG dims must round-trip for $id")
      val g = 28 + (id % 200).toDouble
      assert(math.abs(f.mean_intensity - g) < 1e-9, s"solid-gray mean for $id: ${f.mean_intensity}")
    }
    val aud = Multimodal.extractAudioFeatures(
      Multimodal.syntheticRealMedia(docs, "doc_id", "audio")).collect()
    aud.foreach { f =>
      val id = f.media_id
      assert(f.sample_rate == 8000 && f.n_frames == 800 + (id % 5) * 160)
      assert(f.rms == (1000 + id % 1000) / 32768.0, s"constant-signal rms exact for $id: ${f.rms}")
    }
    val vid = Multimodal.extractVideoFrames(
      Multimodal.syntheticRealMedia(docs, "doc_id", "video"), everyN = 2)
      .collect().groupBy(_.media_id)
    vid.foreach { case (id, fs) =>
      assert(fs.head.n_frames == 2 + (id % 4).toInt, s"GIF frame count for $id")
    }
  }

  test("sampleFrames emits every Nth frame per video") {
    val m = media.withColumn("kind", lit("video"))
      .withColumn("meta", map(lit("frames"), lit("90")))
    val frames = Multimodal.sampleFrames(m, everyN = 30)
    // frames 0, 30, 60 per video
    assert(frames.count() == 50 * 3)
    val idx = frames.select("frame_idx").distinct().collect().map(_.getInt(0)).toSet
    assert(idx == Set(0, 30, 60))
  }

  test("striped PNG aHash has its closed form; imageNearDup pairs same-stripe images") {
    // direct decode: bright=3 stripes → bits of columns 0..2 down all rows
    val f3 = Multimodal.decodeImage(1L, Multimodal.realPngStriped(3, mark = false))
    assert(f3.phash == 7L * 0x0101010101010101L, f3.phash.toHexString)
    // marker pixel adds bit 62; at bright=7 it's already inside the mask
    val f3m = Multimodal.decodeImage(2L, Multimodal.realPngStriped(3, mark = true))
    assert(f3m.phash == (7L * 0x0101010101010101L | (1L << 62)))
    val f7m = Multimodal.decodeImage(3L, Multimodal.realPngStriped(7, mark = true))
    assert(f7m.phash == 127L * 0x0101010101010101L)
    // planted set: ids 0, 7, 14 share stripes (id%7=0); 1 differs
    val idSchema = StructType(Seq(StructField("doc_id", LongType)))
    val ids = df(idSchema, Seq(Row(0L), Row(7L), Row(14L), Row(1L)))
    val pairs = Multimodal.imageNearDup(
      Multimodal.syntheticStripedImages(ids, "doc_id"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // 0 (even) vs 7 (odd): marker differs → hamming 1; 0 vs 14: identical
    assert(pairs((0L, 7L)) == 1 && pairs((0L, 14L)) == 0 && pairs((7L, 14L)) == 1)
    assert(!pairs.keySet.exists(p => p._1 == 1L || p._2 == 1L),
      "different stripes must not pair")
  }
}
