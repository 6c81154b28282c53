package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** WordPiece greedy longest-match: piece-level semantics and the
  * distinct-word-join corpus path. */
class WordpieceSpec extends SparkSpec {

  private val vocab = Set("low", "##er", "##est", "new", "wide", "##st",
    "l", "##o", "##w")

  test("segmentWord: longest match wins at every cursor; ## continuation") {
    assert(Wordpiece.segmentWord("low", vocab) == Seq("low"))
    assert(Wordpiece.segmentWord("lower", vocab) == Seq("low", "##er"))
    assert(Wordpiece.segmentWord("lowest", vocab) == Seq("low", "##est"))
    // greedy takes "low" even though l/##o/##w could also cover it
    assert(Wordpiece.segmentWord("loww", vocab) == Seq("low", "##w"))
    assert(Wordpiece.segmentWord("", vocab) == Seq.empty)
  }

  test("segmentWord: any uncoverable cursor makes the WHOLE word [UNK]") {
    // 'unknown' fails at position 0
    assert(Wordpiece.segmentWord("unknown", vocab) == Seq(Wordpiece.Unk))
    // 'lowx' covers 'low' then fails -> still whole-word UNK (BERT rule)
    assert(Wordpiece.segmentWord("lowx", vocab) == Seq(Wordpiece.Unk))
    // maxPieceLen caps the match window: with window 2, "low" (len 3)
    // is unreachable but l + ##o + ##w still covers
    assert(Wordpiece.segmentWord("low", vocab, maxPieceLen = 2) ==
      Seq("l", "##o", "##w"))
  }

  test("segmentCorpus: distinct-word join path equals per-word segmentation") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val d = df(schema, Seq(
      Row(1L, "Low  LOWER lowest"), Row(2L, null), Row(3L, "low low low")))
    val out = Wordpiece.segmentCorpus(d, "text", "doc_id", vocab.toSeq)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getSeq[String](3))).toMap
    assert(out((1L, 0)) == (("low", Seq("low"))), "normalization lowercases")
    assert(out((1L, 1)) == (("lower", Seq("low", "##er"))))
    assert(out((1L, 2)) == (("lowest", Seq("low", "##est"))))
    assert(out((3L, 2)) == (("low", Seq("low"))), "repeated words resolve per position")
    assert(!out.keySet.exists(_._1 == 2L), "null text contributes nothing")
    intercept[IllegalArgumentException](
      Wordpiece.segmentCorpus(d, "text", "doc_id", Nil))
  }
}
