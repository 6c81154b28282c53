package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: Viterbi semantics, coverage and pruning
  * invariants, and partitioning-independence of the hard-EM chain. */
class UnigramSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val fixture = Seq(
    Row(1L, "low low low low low"), Row(2L, "lower lower newest newest"),
    Row(3L, "newest newest newest newest"), Row(4L, "widest widest widest"))

  test("viterbi: maximizes summed scores with longest-last-piece ties") {
    val scores = Map("a" -> -10L, "b" -> -10L, "ab" -> -12L, "abb" -> -25L)
    // "ab" (-12) beats "a"+"b" (-20)
    assert(Unigram.viterbi("ab", scores, 3) == Seq("ab"))
    // "ab"+"b" (-22) beats "abb" (-25) and "a"+"b"+"b" (-30)
    assert(Unigram.viterbi("abb", scores, 3) == Seq("ab", "b"))
    // tie construction: "aa" via "a"+"a" only; with "aa" scored equal to
    // a+a, the LONGER single piece wins (smaller split point first)
    val tie = Map("a" -> -10L, "aa" -> -20L)
    assert(Unigram.viterbi("aa", tie, 2) == Seq("aa"))
    // out-of-charset character segments as the <unk> piece
    assert(Unigram.viterbi("ax", scores, 3) == Seq("a", Unigram.UnkPiece))
    assert(Unigram.viterbi("xx", scores, 3) ==
      Seq(Unigram.UnkPiece, Unigram.UnkPiece))
  }

  test("train: segmentation concatenates back to every word; chars never pruned") {
    val m = Unigram.train(df(docSchema, fixture), "text",
      vocabSize = 20, iters = 2, maxPieceLen = 6, seedSize = 200)
    val segs = m.segments.collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val word = r.getString(0)
      val syms = r.getSeq[String](1)
      assert(syms.mkString("") == word, s"'$word' segmented to $syms")
    }
    val pieceSet = m.pieces.map(_._1).toSet
    val allChars = segs.map(_.getString(0)).flatMap(_.toSeq).map(_.toString).toSet
    assert(allChars.subsetOf(pieceSet), "every dict character must survive the prune")
    // a frequent multi-char piece must have been learned (that is the point)
    assert(m.pieces.exists(p => p._1.length > 1),
      s"no multi-char piece survived: ${m.pieces}")
    val segSyms = segs.flatMap(_.getSeq[String](1))
    assert(segSyms.exists(_.length > 1),
      "frequent words must segment into multi-char pieces, not characters")
  }

  test("train: identical model under different input partitioning") {
    val d1 = df(docSchema, fixture).repartition(1)
    val d7 = df(docSchema, fixture).repartition(7)
    val m1 = Unigram.train(d1, "text", vocabSize = 15, iters = 2,
      maxPieceLen = 5, seedSize = 100)
    val m7 = Unigram.train(d7, "text", vocabSize = 15, iters = 2,
      maxPieceLen = 5, seedSize = 100)
    assert(m1.pieces == m7.pieces)
    val s1 = m1.segments.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val s7 = m7.segments.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(s1 == s7)
  }

  test("encodeTable: seen words resolve via the join; unseen words Viterbi in-plan") {
    val m = Unigram.train(df(docSchema, fixture), "text",
      vocabSize = 20, iters = 2, maxPieceLen = 6, seedSize = 200)
    val probe = df(docSchema, Seq(Row(9L, "low lowest")))
    val out = Unigram.encodeTable(probe, "text", "doc_id", m, maxPieceLen = 6)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getSeq[String](3)))
      .sortBy(_._1)
    assert(out.length == 2)
    assert(out(0)._2 == "low" && out(0)._3.mkString("") == "low")
    // "lowest" is NOT in the training dict -> segmented in-plan, still exact
    assert(out(1)._2 == "lowest" && out(1)._3.mkString("") == "lowest")
    // and its segmentation equals a direct Viterbi under the model
    assert(out(1)._3 == Unigram.viterbi("lowest", m.pieces.toMap, 6))
  }

  test("corpus-scale: trains on real documents, full coverage, compressive pieces") {
    val docs = graft.sources.ParquetConnector.readTable(spark,
      "/root/testdata/sf0.001/documents.parquet")
    val m = Unigram.train(docs, "text", vocabSize = 400, iters = 2,
      maxPieceLen = 8, seedSize = 3000)
    val segs = m.segments.collect()
    assert(segs.length > 20, s"dict too small: ${segs.length}")
    // every training word reassembles exactly (no <unk> on dict words)
    segs.foreach { r =>
      assert(r.getSeq[String](1).mkString("") == r.getString(0))
    }
    // the learned vocabulary compresses: weighted pieces-per-word must
    // beat the character baseline by a wide margin
    val (pieceTok, charTok) = segs.foldLeft((0L, 0L)) { case ((p, c), r) =>
      val f = r.getLong(2)
      (p + r.getSeq[String](1).size * f, c + r.getString(0).length * f)
    }
    assert(pieceTok * 2 < charTok,
      s"vocab failed to compress: $pieceTok pieces vs $charTok chars")
  }

  test("viterbi: optimal against brute-force enumeration on random short words") {
    val rnd = new scala.util.Random(53)
    val alphabet = "abc"
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, w.length)).flatMap(l =>
        allSegs(w.drop(l)).map(w.take(l) +: _))
    (0 until 60).foreach { _ =>
      val w = (0 until (rnd.nextInt(6) + 1)).map(_ => alphabet(rnd.nextInt(3))).mkString
      // random vocab over some substrings + all chars
      val pieces = (w.sliding(2).toSeq ++ w.sliding(3).toSeq)
        .filter(_ => rnd.nextBoolean()).distinct
      val scores = (alphabet.map(_.toString) ++ pieces)
        .map(p => p -> (-(rnd.nextInt(50) + 1).toLong)).toMap
      val got = Unigram.viterbi(w, scores, 4)
      val best = allSegs(w)
        .filter(_.forall(scores.contains))
        .map(seg => (seg.map(scores).sum, seg))
      val gotScore = got.map(scores).sum
      assert(gotScore == best.map(_._1).max,
        s"word '$w': viterbi $got ($gotScore) vs brute ${best.maxBy(_._1)}")
    }
  }

  test("train: guards reject bad hyperparameters") {
    val d = df(docSchema, fixture)
    intercept[IllegalArgumentException](
      Unigram.train(d, "text", vocabSize = 0))
    intercept[IllegalArgumentException](
      Unigram.train(d, "text", vocabSize = 10, seedSize = 5))
    intercept[IllegalArgumentException](
      Unigram.train(d, "text", vocabSize = 10, seedSize = 500000))
  }
}
