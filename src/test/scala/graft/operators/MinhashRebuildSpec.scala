package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Pins the r20 incremental maintenance rebuild
  * ([[Dedup.minhashIndexIncremental]]) against the full
  * [[Dedup.minhashIndex]] rebuild it replaces: identical row sets on
  * every divergence class (stranded capped docs, half-indexed docs,
  * stray takedown leftovers, over-cap buckets), and a None (skip) on a
  * settled index that already equals its rebuild. */
class MinhashRebuildSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Filler docs with unique texts + a trio per `root` whose members
    * share one cyclically-repeated sentence (identical shingle SETS →
    * identical signatures → same bucket in every band) — the
    * q_maintenance_tick fixture shape. */
  private def corpus(nFill: Int, roots: Seq[Long]): DataFrame = {
    val fill = (1000L until (1000L + nFill)).map(i =>
      Row(i, s"filler article $i " + (0 until 12).map(k => s"w${i}_$k").mkString(" ")))
    val trios = roots.flatMap { r =>
      val s = s"maint $r alpha beta gamma delta"
      Seq(Row(r, Seq.fill(3)(s).mkString(" ")),
        Row(-r - 1, Seq.fill(4)(s).mkString(" ")),
        Seq.fill(5)(s).mkString(" ") match { case t => Row(-r - 2, t) })
    }
    df(schema, fill ++ trios)
  }

  private def rows(d: DataFrame): Set[(Long, Seq[Long], Int, Long)] =
    d.select(col("_id"), col("_sig"), col("_band"), col("_bucket"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getInt(2), r.getLong(3)))
      .toSet

  test("stranded capped docs: incremental equals the full rebuild") {
    val all = corpus(6, Seq(1L, 2L))
    // cap 2 drops every trio bucket whole: roots have ZERO index rows
    val idx = Dedup.minhashIndex(all, "text", "doc_id", maxBucketSize = 2)
    assert(idx.filter(col("_id").isin(1L, 2L)).count() === 0L)
    // the clones are taken down; the release keeps fillers + roots
    val release = all.filter(col("doc_id") >= 0)
    val idxAfterTakedown = idx.filter(col("_id") >= 0)
    val full = Dedup.minhashIndex(release, "text", "doc_id", maxBucketSize = 2)
    val incr = Dedup.minhashIndexIncremental(release, "text", "doc_id",
      idxAfterTakedown, maxBucketSize = 2)
    assert(incr.isDefined, "a stranded doc must force a rebuild")
    assert(rows(incr.get) === rows(full))
    // the re-capped roots are probeable again
    assert(incr.get.filter(col("_id").isin(1L, 2L)).count() === 32L)
  }

  test("half-indexed doc is recomputed; settled index skips") {
    val release = corpus(8, Nil)
    val full = Dedup.minhashIndex(release, "text", "doc_id", maxBucketSize = 2000)
    // simulate the half-indexed crash tail: drop half of one doc's rows
    val damaged = full.filter(!(col("_id") === 1003L && col("_band") < 8))
    val incr = Dedup.minhashIndexIncremental(release, "text", "doc_id", damaged)
    assert(incr.isDefined, "a half-indexed doc must force a rebuild")
    assert(rows(incr.get) === rows(full))
    // a settled index IS its own rebuild — the rewrite is skipped
    assert(Dedup.minhashIndexIncremental(release, "text", "doc_id", full).isEmpty)
  }

  test("stray takedown leftover forces the rebuild that drops it") {
    val all = corpus(8, Nil)
    val idx = Dedup.minhashIndex(all, "text", "doc_id")
    val release = all.filter(col("doc_id") =!= 1002L) // 1002 taken down
    val full = Dedup.minhashIndex(release, "text", "doc_id")
    val incr = Dedup.minhashIndexIncremental(release, "text", "doc_id", idx)
    assert(incr.isDefined, "a stray index doc must force a rebuild")
    assert(rows(incr.get) === rows(full))
  }

  test("over-cap bucket re-caps even with every doc covered") {
    val all = corpus(4, Seq(1L))
    // uncapped build keeps the trio bucket (3 members, each fully banded)
    val idx = Dedup.minhashIndex(all, "text", "doc_id", maxBucketSize = 0)
    val full = Dedup.minhashIndex(all, "text", "doc_id", maxBucketSize = 2)
    val incr = Dedup.minhashIndexIncremental(all, "text", "doc_id", idx,
      maxBucketSize = 2)
    assert(incr.isDefined, "an over-cap bucket must force a re-cap")
    assert(rows(incr.get) === rows(full))
  }
}
