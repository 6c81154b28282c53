package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The DECODE step is real for the formats the JDK ships readers for —
  * PNG, JPEG, BMP, GIF, WBMP, TIFF via `javax.imageio` ([[decodeImage]]:
  * true dimensions, mean luminance, and a 64-bit average-hash
  * perceptual fingerprint). Payloads no bundled reader recognizes fall
  * back to the clearly-marked deterministic byte-derived features
  * ([[fakeDecodeImage]]) so pipelines stay total over dirty corpora;
  * exotic codecs (HEIC, AV1 frames…) would slot a JNI/javacv decoder
  * into the same `mapPartitions` seam without touching the dataflow.
  *
  * Scale notes: binary payloads dominate row size → `maxPartitionBytes`
  * governs batch memory; derived features are small and should be
  * written columnar next to a pointer (uri/offset) rather than the bytes
  * themselves when the source is re-readable.
  */
object Multimodal {

  /** Media row schema: opaque payload + typed metadata, the storage
    * contract for ingesting media into parquet. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image | audio | video
    StructField("uri", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           mean_intensity: Double, phash: Long)

  /** Real image decode via the JDK's bundled `javax.imageio` readers
    * (PNG/JPEG/BMP/GIF/WBMP — no external codecs needed): true
    * width/height, mean luminance (ITU-R BT.601: 0.299R + 0.587G +
    * 0.114B), and a 64-bit AVERAGE-HASH perceptual fingerprint — the
    * image average-pooled to an 8×8 luminance grid, bit i set when cell
    * i exceeds the grid mean (near-duplicate images at different
    * sizes/compression levels land within a small hamming distance, so
    * the output feeds the same `bit_count(a XOR b)` candidate machinery
    * as [[Dedup.simhashCandidates]]). The pooling is plain integer-grid
    * arithmetic, not a rendering pipeline — bit-identical everywhere.
    *
    * Unrecognized or truncated payloads (a scraped corpus is full of
    * them) degrade to [[fakeDecodeImage]]'s deterministic byte-derived
    * features instead of failing the task — pipelines stay total; join
    * against `width > 0` semantics downstream if only true decodes are
    * wanted (the fallback's fake dimensions are >= 64 by construction,
    * real failures are distinguishable by re-decoding, or swap in a
    * stricter decoder through the [[extractImageFeatures]] parameter). */
  /** One-time per-JVM ImageIO configuration: never spill decode scratch
    * to executor-local disk tmp files. A lazy val so the global setter
    * runs once per executor, not once per decoded row. */
  private lazy val imageIoConfigured: Boolean = {
    javax.imageio.ImageIO.setUseCache(false); true
  }

  def decodeImage(mediaId: Long, payload: Array[Byte]): ImageFeatures = {
    if (payload == null || payload.isEmpty) return ImageFeatures(mediaId, 0, 0, 0.0, 0L)
    imageIoConfigured
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return fakeDecodeImage(mediaId, payload)
    val w = img.getWidth; val h = img.getHeight
    if (w == 0 || h == 0) return fakeDecodeImage(mediaId, payload)
    val grid = new Array[Double](64)
    val cnt = new Array[Long](64)
    var sum = 0.0
    var y = 0
    while (y < h) {
      val gy = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        sum += lum
        val gi = gy * 8 + (x.toLong * 8 / w).toInt
        grid(gi) += lum; cnt(gi) += 1
        x += 1
      }
      y += 1
    }
    var gmean = 0.0
    var i = 0
    var cells = 0
    while (i < 64) { if (cnt(i) > 0) { grid(i) /= cnt(i); gmean += grid(i); cells += 1 }; i += 1 }
    gmean /= math.max(cells, 1)
    var hash = 0L
    i = 0
    while (i < 64) { if (cnt(i) > 0 && grid(i) > gmean) hash |= (1L << i); i += 1 }
    ImageFeatures(mediaId, w, h, sum / (w.toLong * h), hash)
  }

  /** FALLBACK DECODER — deterministic fake for payloads no bundled
    * reader recognizes: derives stable pseudo width/height/intensity/
    * phash purely from the bytes, so pipelines over dirty corpora stay
    * total and reproducible. */
  def fakeDecodeImage(mediaId: Long, payload: Array[Byte]): ImageFeatures = {
    if (payload == null || payload.isEmpty) return ImageFeatures(mediaId, 0, 0, 0.0, 0L)
    var h = 0xcbf29ce484222325L
    var sum = 0L
    var i = 0
    while (i < payload.length) { h = h * 31L + (payload(i) & 0xffL); sum += (payload(i) & 0xff); i += 1 }
    val width = 64 + (math.abs(h % 1024)).toInt
    val height = 64 + (math.abs((h >> 10) % 1024)).toInt
    ImageFeatures(mediaId, width, height, sum.toDouble / payload.length, h)
  }

  /** Feature extraction over a media table: batched per-partition decode.
    * This is the Scala analog of a Pandas-UDF `mapInPandas` pipeline —
    * `mapPartitions` gives the same batch-at-a-time shape a vectorized
    * decoder wants, with zero driver involvement. The decoder is
    * pluggable (default [[decodeImage]], the real JDK-reader path with
    * the deterministic fallback); pass a custom one for exotic codecs. */
  def extractImageFeatures(media: DataFrame,
                           decoder: (Long, Array[Byte]) => ImageFeatures = decodeImage)
      : Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decoder(id, bytes) } }
  }

  case class AudioFeatures(media_id: Long, sample_rate: Int, channels: Int,
                           n_frames: Long, duration_s: Double, rms: Double)

  /** Real audio decode via the JDK's bundled `javax.sound.sampled`
    * readers (WAV/AIFF/AU — no external codecs): true sample rate,
    * channel count, frame count, duration, and RMS amplitude
    * (normalized to [0,1]) over the PCM samples — the standard
    * loudness/silence signal a speech-data curation pass filters on.
    * Handles 16-bit signed (either endianness) and 8-bit PCM directly;
    * payloads no bundled reader recognizes, and exotic sample formats,
    * degrade to [[fakeDecodeAudio]]'s deterministic byte-derived
    * features — same totality contract as [[decodeImage]]. */
  def decodeAudio(mediaId: Long, payload: Array[Byte]): AudioFeatures = {
    if (payload == null || payload.isEmpty) return AudioFeatures(mediaId, 0, 0, 0L, 0.0, 0.0)
    val stream =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (stream == null) return fakeDecodeAudio(mediaId, payload)
    try {
      val f = stream.getFormat
      val pcmSigned = f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val pcmUnsigned = f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      val bits = f.getSampleSizeInBits
      if (!((pcmSigned && bits == 16) || ((pcmSigned || pcmUnsigned) && bits == 8)))
        return fakeDecodeAudio(mediaId, payload)
      val data = stream.readAllBytes()
      val bytesPerSample = bits / 8
      val nSamples = data.length / bytesPerSample
      val frames = nSamples.toLong / math.max(f.getChannels, 1)
      var sumSq = 0.0
      var i = 0
      if (bits == 16) {
        val be = f.isBigEndian
        while (i + 1 < data.length) {
          val lo = data(if (be) i + 1 else i) & 0xff
          val hi = data(if (be) i else i + 1).toInt
          val s = ((hi << 8) | lo).toShort / 32768.0
          sumSq += s * s
          i += 2
        }
      } else {
        while (i < data.length) {
          val s = if (pcmSigned) data(i) / 128.0 else ((data(i) & 0xff) - 128) / 128.0
          sumSq += s * s
          i += 1
        }
      }
      val rate = f.getSampleRate
      AudioFeatures(mediaId, rate.toInt, f.getChannels, frames,
        if (rate > 0) frames / rate.toDouble else 0.0,
        if (nSamples > 0) math.sqrt(sumSq / nSamples) else 0.0)
    } finally stream.close()
  }

  /** FALLBACK AUDIO DECODER — deterministic byte-derived features for
    * payloads no bundled reader handles, mirroring [[fakeDecodeImage]]. */
  def fakeDecodeAudio(mediaId: Long, payload: Array[Byte]): AudioFeatures = {
    if (payload == null || payload.isEmpty) return AudioFeatures(mediaId, 0, 0, 0L, 0.0, 0.0)
    var h = 0xcbf29ce484222325L
    var sum = 0L
    var i = 0
    while (i < payload.length) { h = h * 31L + (payload(i) & 0xffL); sum += (payload(i) & 0xff); i += 1 }
    val rate = 8000 + (math.abs(h % 4) * 8000).toInt        // 8/16/24/32 kHz
    val channels = 1 + (math.abs((h >> 8) % 2)).toInt
    val frames = payload.length.toLong
    AudioFeatures(mediaId, rate, channels, frames, frames / rate.toDouble,
      (sum.toDouble / payload.length) / 255.0)
  }

  /** Audio feature extraction — the same pluggable per-partition batch
    * shape as [[extractImageFeatures]]. */
  def extractAudioFeatures(media: DataFrame,
                           decoder: (Long, Array[Byte]) => AudioFeatures = decodeAudio)
      : Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decoder(id, bytes) } }
  }

  /** Frame-sampling plumbing for video: emits (media_id, frame_idx) rows
    * for every `everyN`th frame given a frame-count in `meta("frames")` —
    * the flatMap shape a real frame extractor plugs into. */
  def sampleFrames(media: DataFrame, everyN: Int = 30): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0),
          greatest(coalesce(element_at(col("meta"), "frames").cast("int"), lit(0)) - 1, lit(0)),
          lit(everyN))).as("frame_idx"))

  /** Build a media table from any (id, stringPayload) source —
    * deterministic test fixture generator; payload = utf8 bytes. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      concat(lit("synthetic://"), col(idCol)).as("uri"),
      encode(col(textCol), "UTF-8").as("payload"),
      map(lit("frames"), (col(idCol) % 300 + 1).cast("string")).as("meta"))
}
