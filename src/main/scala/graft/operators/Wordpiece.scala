package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece segmentation (Wu et al. 2016 — the BERT tokenizer's
  * greedy longest-match-first algorithm), completing the big-three
  * subword families next to [[Bpe]] (merge-based) and [[Unigram]]
  * (likelihood-based). WordPiece is INFERENCE-only here: it consumes a
  * vocabulary (typically a published BERT vocab, or [[Bpe]]/[[Unigram]]
  * pieces re-exported with continuation marks) and segments each word
  * by repeatedly taking the LONGEST vocab piece at the cursor,
  * continuation pieces carrying the `##` prefix; if no piece fits at
  * any cursor, the WHOLE word becomes `[UNK]` (the BERT convention —
  * not a partial fallback).
  *
  * Deterministic by construction (greedy, no scores, no ties), so the
  * pinned-fixture query oracles as golden rows and corpus behavior is
  * property-pinned.
  *
  * Scale shape, same as [[Unigram.encodeTable]]: the corpus reduces to
  * its DISTINCT word dictionary, each distinct word segments once
  * (executor-side, vocabulary in the closure — publish-sized, ≤ 200k
  * asserted), and documents resolve through a word-keyed join. The
  * corpus text itself never passes through per-word Scala.
  */
object Wordpiece {

  val Unk = "[UNK]"

  /** Greedy longest-match segmentation of one word. */
  def segmentWord(word: String, vocab: Set[String],
                  maxPieceLen: Int = 16): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = 0
    while (p < word.length) {
      var len = math.min(maxPieceLen, word.length - p)
      var found: String = null
      while (len >= 1 && found == null) {
        val raw = word.substring(p, p + len)
        val cand = if (p == 0) raw else "##" + raw
        if (vocab.contains(cand)) found = cand else len -= 1
      }
      if (found == null) return Seq(Unk)
      out += found
      p += (if (p == 0) found.length else found.length - 2)
    }
    out.toList
  }

  /** Segment a corpus: tokenize ([[Bpe.wordFreq]]'s normalization),
    * segment the DISTINCT word dictionary, join back by word. Output
    * one row per (docCol, pos, word) with its piece array. */
  def segmentCorpus(corpus: DataFrame, textCol: String, docCol: String,
                    vocab: Seq[String], maxPieceLen: Int = 16): DataFrame = {
    require(vocab.nonEmpty && vocab.size <= 200000,
      s"vocab must be 1..200k pieces, got ${vocab.size}")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vset = vocab.toSet
    val ml = maxPieceLen
    val words = corpus.select(col(docCol),
        posexplode(split(graft.functions.TextFunctions.normalizeForFingerprint(
          coalesce(col(textCol), lit(""))), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    val segs = words.select(col("word")).distinct().as[String]
      .map(w => (w, segmentWord(w, vset, ml)))
      .toDF("word", "syms")
    words.join(segs, Seq("word"))
      .select(col(docCol), col("pos"), col("word"), col("syms"))
  }
}
