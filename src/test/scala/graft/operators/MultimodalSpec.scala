package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema contract, per-partition batch decode shape,
  * frame sampling. The decode itself is the documented deterministic stub
  * (no codecs in this container) — everything around it is real. */
class MultimodalSpec extends SparkSpec {

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
}
