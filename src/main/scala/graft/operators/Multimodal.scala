package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[fakeDecodeImage]]) — every other
  * part (schema, batch shape, partition sizing, the mapPartitions
  * plumbing a real decoder would slot into) is real and tested. On a
  * real cluster, swap `fakeDecodeImage` for a JNI/javacv decoder; the
  * dataflow is unchanged.
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

  /** STUB DECODER — deterministic fake. A real implementation would
    * decode `payload` with an image library; this derives stable pseudo
    * width/height/intensity/phash purely from the bytes so tests are
    * reproducible in this codec-free container. */
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
    * decoder wants, with zero driver involvement. */
  def extractImageFeatures(media: DataFrame): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => fakeDecodeImage(id, bytes) } }
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
