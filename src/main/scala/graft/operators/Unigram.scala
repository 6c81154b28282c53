package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018 — the SentencePiece
  * `unigram` model) in its deterministic hard-EM form, completing the
  * tokenizer family next to [[Bpe]]: BPE grows a vocabulary bottom-up
  * by merging; unigram starts from an over-complete seed and PRUNES,
  * segmenting by maximum-likelihood Viterbi instead of greedy merges —
  * the model behind most modern multilingual tokenizers.
  *
  * Same scale reduction as [[Bpe]]: everything trains on the DISTINCT
  * word-frequency dictionary (10⁸ words), never the corpus (10¹¹
  * tokens). Per EM round:
  *   E-step — Viterbi-best segmentation of every dict word under the
  *     current piece scores (per-word dynamic programming over ≤
  *     word-length positions; dict-distributed via `mapPartitions`,
  *     the one genuinely imperative per-row kernel in this engine —
  *     a DP with backtracking is not expressible as a Column);
  *   M-step — piece counts from the best segmentations (one
  *     dict-sized partial-aggregated groupBy, weighted by word freq),
  *     then add-1-smoothed log scores and a prune to `vocabSize`
  *     (count DESC, piece ASC; single characters are never pruned, so
  *     every word stays segmentable).
  *
  * Determinism: hard-EM (Viterbi, not forward–backward) makes every
  * round a pure function of the dict — integer counts, argmax with
  * pinned tie-breaks (higher path score, then the LONGEST last piece),
  * scores quantized to ⌊ln(p)·10⁸⌋ longs before they ever enter a
  * comparison. Same input ⇒ same vocabulary, same segmentation, any
  * partitioning (spec-pinned). Like `q_bpe_train`, the data-dependent
  * multi-round chain is oracled as golden literal rows on a pinned
  * fixture; corpus-scale behavior is property-pinned in UnigramSpec.
  *
  * Driver state: the piece table only (≤ `seedSize`, asserted) — the
  * dict itself never leaves the executors.
  */
object Unigram {

  /** A trained model: `pieces` (piece, score_fp) — score_fp =
    * ⌊ln(p)·10⁸⌋ under the final counts — and `segments`, the final
    * Viterbi segmentation of every training word (word, syms, freq):
    * corpus encoding is a word-keyed join against it. */
  final case class UnigramModel(pieces: Seq[(String, Long)],
                                segments: DataFrame)

  private val Scale = 1e8

  /** Add-1-smoothed fixed-point log-probabilities over a count table:
    * score(p) = ⌊ln((c_p + 1) / (T + |V|))·10⁸⌋. Smoothing keeps
    * zero-count survivors (single chars) finite without a special
    * floor. */
  private def logScores(counts: Seq[(String, Long)]): Map[String, Long] = {
    val total = counts.map(_._2).sum.toDouble + counts.size
    counts.map { case (p, c) =>
      p -> math.floor(math.log((c + 1).toDouble / total) * Scale).toLong
    }.toMap
  }

  /** The out-of-vocabulary piece: a character outside the trained
    * charset segments as this literal (the SentencePiece `<unk>`
    * convention) at [[UnkScore]] — worse than any real piece, so it is
    * only ever chosen when nothing else covers the position. */
  val UnkPiece = "<unk>"
  val UnkScore: Long = -100L * 100000000L

  /** Viterbi-best segmentation of `word` under `scores`: maximize the
    * summed piece scores; ties prefer the longer LAST piece at every
    * boundary (smaller split point — the first candidate the ascending
    * scan sets wins against equal-score later ones). Single characters
    * missing from `scores` traverse as [[UnkPiece]] at [[UnkScore]],
    * so every word is segmentable; words whose characters were all in
    * training never touch that path. */
  private[operators] def viterbi(word: String, scores: Map[String, Long],
                                 maxPieceLen: Int): Seq[String] = {
    val w = word.length
    if (w == 0) return Seq.empty
    val NoPath = Long.MinValue / 4
    val best = Array.fill(w + 1)(NoPath)
    val back = Array.fill(w + 1)(-1)
    best(0) = 0L
    var j = 1
    while (j <= w) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (best(i) != NoPath) {
          val s = scores.get(word.substring(i, j)) match {
            case Some(v) => v
            case None if j - i == 1 => UnkScore
            case None => NoPath
          }
          if (s != NoPath) {
            val cand = best(i) + s
            if (cand > best(j)) { best(j) = cand; back(j) = i }
          }
        }
        i += 1
      }
      j += 1
    }
    var at = w
    var out = List.empty[String]
    while (at > 0) {
      val piece = word.substring(back(at), at)
      out = (if (scores.contains(piece)) piece else UnkPiece) :: out
      at = back(at)
    }
    out
  }

  /** Train on the corpus' word-frequency dict.
    *
    * @param vocabSize   target piece count after the final prune
    *                    (single chars always survive on top of it)
    * @param iters       hard-EM rounds (2–3 converge in practice)
    * @param maxPieceLen longest candidate piece
    * @param seedSize    over-complete seed size (multi-char pieces kept
    *                    from the substring count pass); driver holds
    *                    this many (piece, count) rows — asserted ≤ 200k */
  def train(corpus: DataFrame, textCol: String, vocabSize: Int = 2000,
            iters: Int = 2, maxPieceLen: Int = 8,
            seedSize: Int = 8000): UnigramModel = {
    require(vocabSize >= 1 && iters >= 1 && maxPieceLen >= 1, "bad hyperparameters")
    require(seedSize >= vocabSize, s"seedSize $seedSize < vocabSize $vocabSize")
    require(seedSize <= 200000, s"seedSize $seedSize exceeds the driver bound (200k)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val dict: Dataset[(String, Long)] = Bpe.wordFreq(corpus, textCol)
      .as[(String, Long)].persist()
    try {
      // ---- seed: substring counts, all chars + top multi-char ----
      val subCounts = dict.flatMap { case (word, freq) =>
        for {
          i <- 0 until word.length
          j <- (i + 1) to math.min(word.length, i + maxPieceLen)
        } yield (word.substring(i, j), freq)
      }.groupBy(col("_1").as("piece"))
        .agg(sum(col("_2")).as("cnt"))
      val chars = subCounts.filter(length(col("piece")) === 1)
        .as[(String, Long)].collect().toSeq
      val multi = subCounts.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece").asc).limit(seedSize)
        .as[(String, Long)].collect().toSeq
      var scores = logScores(chars ++ multi)

      // ---- hard-EM rounds ----
      var segments: DataFrame = null
      (1 to iters).foreach { round =>
        val sc = scores
        val ml = maxPieceLen
        val segs = dict.map { case (word, freq) =>
          (word, viterbi(word, sc, ml), freq) }
          .toDF("word", "syms", "freq")
        val counts = segs.select(explode(col("syms")).as("piece"), col("freq"))
          .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
          .as[(String, Long)].collect().toSeq
        val counted = counts.toMap
        // chars never pruned (coverage); zero-count chars keep count 0
        val charRows = chars.map { case (p, _) => p -> counted.getOrElse(p, 0L) }
        val multiRows = counts.filter(_._1.length > 1)
          .sortBy { case (p, c) => (-c, p) }
          .take(math.max(0, vocabSize - charRows.size))
        scores = logScores(charRows ++ multiRows)
        if (round == iters) {
          // final segmentation under the FINAL scores
          val fs = scores
          segments = dict.map { case (word, freq) =>
            (word, viterbi(word, fs, ml), freq) }
            .toDF("word", "syms", "freq")
            .localCheckpoint(true)
        }
      }
      UnigramModel(scores.toSeq.sortBy(_._1), segments)
    } finally dict.unpersist(false)
  }

  /** Segment a corpus through a trained model: normalize + split (the
    * [[Bpe.wordFreq]] tokenization), then resolve each word through the
    * word-keyed `segments` join; words unseen in training Viterbi-parse
    * against the broadcast piece table in-plan (dict-of-the-delta
    * sized, not corpus-sized, after a distinct). Output one row per
    * (docCol, position, word) with its piece array. */
  def encodeTable(corpus: DataFrame, textCol: String, docCol: String,
                  model: UnigramModel, maxPieceLen: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val words = corpus.select(col(docCol),
        posexplode(split(graft.functions.TextFunctions.normalizeForFingerprint(
          col(textCol)), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    val seen = words.join(model.segments.select(col("word"), col("syms")),
      Seq("word"), "left")
    // unseen words: segment their DISTINCT dictionary, then join back
    val unseenDict = seen.filter(col("syms").isNull)
      .select(col("word")).distinct().as[String]
    val sc = model.pieces.toMap
    val extra = unseenDict.map(w => (w, viterbi(w, sc, maxPieceLen)))
      .toDF("word", "_syms2")
    seen.join(extra, Seq("word"), "left")
      .select(col(docCol), col("pos"), col("word"),
        coalesce(col("syms"), col("_syms2")).as("syms"))
  }
}
