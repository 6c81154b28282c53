package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** LM quality scoring: hand-computed add-k bigram NLLs, UNK mapping at a
  * capped vocabulary, short-document edges, partition-order invariance
  * (the fixed-point-long-sum determinism claim). */
class LanguageModelSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  // ref bigrams: "a b a b" -> (a,b),(b,a),(a,b); "a b" -> (a,b)
  // c12: (a,b)=3, (b,a)=1; totals: a=3, b=1; vocab {a,b}; event space 3.
  private def refDf = df(docSchema, Seq(Row(1L, "a b a b"), Row(2L, "a b")))

  private def score(corpus: Seq[(Long, String)], vocabSize: Int = 100): Map[Long, Row] = {
    val lm = LanguageModel.train(refDf, "text", vocabSize)
    LanguageModel.scoreNll(df(docSchema, corpus.map { case (i, t) => Row(i, t) }),
      "text", "doc_id", lm, addK = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("hand-computed NLL: seen bigram, unseen-word bigrams, mixed doc") {
    val out = score(Seq(10L -> "a b", 11L -> "z q", 12L -> "a b z"))
    // (a,b): -ln((3+.5)/(3+.5*3)) = ln(9/7) = 0.2513
    assert(out(10L).getLong(1) == 1L)
    assert(out(10L).getDouble(2) == 0.2513)
    assert(out(10L).getDouble(3) == 1.2857) // round(exp(0.2513), 4)
    // z,q are OOV -> (unk,unk): -ln(0.5/(0+1.5)) = ln 3 = 1.09861229 -> avg 1.0986
    assert(out(11L).getLong(1) == 1L)
    assert(out(11L).getDouble(2) == 1.0986)
    // (a,b) then (b,unk): -ln((0+.5)/(1+1.5)) = ln 5 = 1.60943791
    // avg = (0.25131443 + 1.60943791) / 2 = 0.93037617 -> 0.9304
    assert(out(12L).getLong(1) == 2L)
    assert(out(12L).getDouble(2) == 0.9304)
  }

  test("documents with fewer than two tokens keep n_bigrams 0 and null scores") {
    val out = score(Seq(20L -> "solo", 21L -> "", 22L -> "   \n\t "))
    Seq(20L, 21L, 22L).foreach { id =>
      assert(out(id).getLong(1) == 0L, s"doc $id")
      assert(out(id).isNullAt(2) && out(id).isNullAt(3), s"doc $id")
    }
  }

  test("vocabSize caps the vocabulary with a deterministic tie-break") {
    // a and b tie at freq 3; token asc keeps 'a'. Ref maps to
    // a,unk,a,unk / a,unk: c12 (a,unk)=3, (unk,a)=1; totals a=3, unk=1;
    // event space 2. Doc "a b": (a,unk) -> -ln(3.5/(3+1)) = ln(8/7) = 0.1335
    val out = score(Seq(30L -> "a b"), vocabSize = 1)
    assert(out(30L).getDouble(2) == 0.1335)
  }

  test("normalization feeds the LM: case and whitespace collapse before bigramming") {
    val out = score(Seq(40L -> "  A   B ", 41L -> "a b"))
    assert(out(40L).getDouble(2) == out(41L).getDouble(2))
  }

  test("score is invariant to corpus partitioning (order-independent DECIMAL sum)") {
    val corpus = (0L until 50L).map(i => i -> s"a b a z${i % 7} b a")
    val lm = LanguageModel.train(refDf, "text", 100)
    val one = LanguageModel.scoreNll(
      df(docSchema, corpus.map { case (i, t) => Row(i, t) }).coalesce(1),
      "text", "doc_id", lm).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val many = LanguageModel.scoreNll(
      df(docSchema, corpus.map { case (i, t) => Row(i, t) }).repartition(13),
      "text", "doc_id", lm).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(one == many)
  }

  test("qualityBuckets: exact thirds, lexicographic tie handling, null passthrough") {
    // 9 scored docs -> k1 = 3, k2 = 6. Scores engineered with a TIE
    // across the head/middle boundary: docs 3,4,5 share 0.5 — the
    // (score, id) pair order puts 3 in head, 4..5 in middle.
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("avg_nll", DoubleType)))
    val rows = Seq(
      Row(1L, 0.1), Row(2L, 0.2), Row(3L, 0.5), Row(4L, 0.5), Row(5L, 0.5),
      Row(6L, 0.7), Row(7L, 0.8), Row(8L, 0.9), Row(9L, 1.0),
      Row(10L, null)) // unscored: bucket stays null
    val out = LanguageModel.qualityBuckets(df(schema, rows), "doc_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(out == Map(
      1L -> "head", 2L -> "head", 3L -> "head",
      4L -> "middle", 5L -> "middle", 6L -> "middle",
      7L -> "tail", 8L -> "tail", 9L -> "tail",
      10L -> null), out.toString)
  }

  test("qualityBuckets: all-null scores yield all-null buckets") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("avg_nll", DoubleType)))
    val out = LanguageModel.qualityBuckets(
      df(schema, Seq(Row(1L, null), Row(2L, null))), "doc_id")
      .collect()
    assert(out.length == 2 && out.forall(_.isNullAt(2)))
  }

  // ---- interpolated Kneser–Ney trigram ----

  // KN ref corpus: one doc "a b c a b d" ->
  // trigrams (a,b,c) (b,c,a) (c,a,b) (a,b,d)
  private def knRefDf = df(docSchema, Seq(Row(1L, "a b c a b d")))

  /** Local model mirror of trainKn's tables on the tiny ref corpus. */
  private object KnRef {
    val tri = Map(("a","b","c") -> 1L, ("b","c","a") -> 1L, ("c","a","b") -> 1L, ("a","b","d") -> 1L)
    val pre12 = Map(("a","b") -> (2L, 2L), ("b","c") -> (1L, 1L), ("c","a") -> (1L, 1L))
    val contBi = Map(("b","c") -> 1L, ("c","a") -> 1L, ("a","b") -> 1L, ("b","d") -> 1L)
    val contMid = Map("b" -> (2L, 2L), "c" -> (1L, 1L), "a" -> (1L, 1L))
    val contUni = Map("c" -> 1L, "a" -> 1L, "b" -> 1L, "d" -> 1L)
    val n1pAll = 4L; val t1Types = 4L
    val vocab = Seq("a", "b", "c", "d") // freq desc (a2 b2 c1 d1), token asc
    val v = vocab.size + 1.0
    val D = 0.75
    def mapU(w: String): String = if (vocab.contains(w)) w else LanguageModel.Unk
    // fixed-order IEEE mirror of scoreKnNll's expression tree
    def p1(w3: String): Double = {
      val n1p3 = contUni.getOrElse(w3, 0L)
      (math.max(n1p3.toDouble - D, 0.0) + D * t1Types.toDouble / v) / n1pAll.toDouble
    }
    def p2(w2: String, w3: String): Double = {
      val (t2c, n2f) = contMid.getOrElse(w2, (0L, 0L))
      if (t2c > 0)
        (math.max(contBi.getOrElse((w2, w3), 0L).toDouble - D, 0.0) + D * n2f.toDouble * p1(w3)) / t2c.toDouble
      else p1(w3)
    }
    def p3(w1: String, w2: String, w3: String): Double = {
      val (t12, n12) = pre12.getOrElse((w1, w2), (0L, 0L))
      if (t12 > 0)
        (math.max(tri.getOrElse((w1, w2, w3), 0L).toDouble - D, 0.0) + D * n12.toDouble * p2(w2, w3)) / t12.toDouble
      else p2(w2, w3)
    }
    /** Quantized per-doc expectation replaying the fixed-point mean. */
    def avgNll(trigrams: Seq[(String, String, String)]): Double = {
      val fs = trigrams.map { case (a, b, c) =>
        math.floor(-math.log(p3(mapU(a), mapU(b), mapU(c))) * 1e8).toLong }
      val n = fs.size
      ((fs.sum + n * 5000L) / (n * 10000L)) * 0.0001
    }
  }

  test("trainKn: hand-counted tables on the tiny corpus") {
    val lm = LanguageModel.trainKn(knRefDf, "text", vocabSize = 100)
    assert(lm.vocabTokens.toSeq == KnRef.vocab)
    assert(lm.tri.collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap == KnRef.tri)
    assert(lm.pre12.collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap == KnRef.pre12)
    assert(lm.contBi.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap == KnRef.contBi)
    assert(lm.contMid.collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap == KnRef.contMid)
    assert(lm.contUni.collect().map(r => (r.getString(0), r.getLong(1))).toMap == KnRef.contUni)
    assert(lm.n1pAll == KnRef.n1pAll && lm.t1Types == KnRef.t1Types)
  }

  test("KN probabilities sum to exactly 1 over the closed event space (local mirror)") {
    // seen context (a,b); backoff context (z,a) -> order-2; double-backoff
    // (z,z) -> order-1: each must normalize over V + UNK
    val events = KnRef.vocab :+ LanguageModel.Unk
    for (ctx <- Seq(("a", "b"), (LanguageModel.Unk, "a"), (LanguageModel.Unk, LanguageModel.Unk))) {
      val s = events.map(w3 => KnRef.p3(ctx._1, ctx._2, w3)).sum
      assert(math.abs(s - 1.0) < 1e-12, s"sum over events for $ctx was $s")
    }
  }

  test("scoreKnNll: exact equality with the local fixed-point mirror, backoff included") {
    val lm = LanguageModel.trainKn(knRefDf, "text", vocabSize = 100)
    val docs = Seq(
      10L -> "a b c",        // fully seen trigram
      11L -> "a b x",        // seen context, UNK continuation
      12L -> "x y z",        // all-UNK: double backoff to the unigram floor
      13L -> "c a b d",      // mixed: seen + unseen-context trigrams
      14L -> "a b")          // too short: no trigram
    val out = LanguageModel.scoreKnNll(
      df(docSchema, docs.map { case (i, t) => Row(i, t) }), "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> r).toMap
    def grams(t: String) = t.split(" ").toSeq.sliding(3).filter(_.size == 3)
      .map(w => (w(0), w(1), w(2))).toSeq
    for ((id, text) <- docs if text.split(" ").length >= 3) {
      assert(out(id).getLong(1) == grams(text).size)
      assert(out(id).getDouble(2) == KnRef.avgNll(grams(text)),
        s"doc $id ($text): got ${out(id).getDouble(2)}")
    }
    assert(out(14L).getLong(1) == 0L && out(14L).isNullAt(2))
  }

  test("saveKn/loadKn round trip: the loaded model scores bit-identically") {
    val conn = new graft.sources.ParquetConnector(spark,
      java.nio.file.Files.createTempDirectory("graft_knmodel_").toString)
    val lm = LanguageModel.trainKn(knRefDf, "text", vocabSize = 100)
    LanguageModel.saveKn(lm, conn, "km")
    val loaded = LanguageModel.loadKn(conn, "km")
    assert(loaded.vocabTokens.toSeq == lm.vocabTokens.toSeq)
    assert(loaded.n1pAll == lm.n1pAll && loaded.t1Types == lm.t1Types)
    val docs = df(docSchema, Seq(Row(1L, "a b c x"), Row(2L, "x y z"), Row(3L, "c a b d")))
    def scores(m: LanguageModel.KnTrigramLm) =
      LanguageModel.scoreKnNll(docs, "text", "doc_id", m)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(scores(loaded) == scores(lm))
  }

  test("scoreKnNll is partition-order invariant (long-sum determinism)") {
    val lm = LanguageModel.trainKn(knRefDf, "text", vocabSize = 100)
    val docs = df(docSchema, (1L to 40L).map(i => Row(i, "a b c a b d x " * (i % 5 + 1).toInt)))
    val a = LanguageModel.scoreKnNll(docs, "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = LanguageModel.scoreKnNll(docs.repartition(17), "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  test("minKProb: worst-k mean dominates the plain mean; members separate from OOV docs") {
    val lm = LanguageModel.trainKn(knRefDf, "text", vocabSize = 100)
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val member = knRefDf.collect().head.getString(
      knRefDf.schema.fieldIndex("text"))
    val docs = df(docSchema, Seq(
      Row(1L, member),                               // seen verbatim
      Row(2L, "zzq qqz zqz zzq qqz zqz zzq qqz"),    // all OOV
      Row(3L, "ab")))                                // < 3 tokens: unscored
    val out = LanguageModel.minKProb(docs, "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> r).toMap
    // worst-k% mean is a max-subset mean: always >= the plain mean
    Seq(1L, 2L).foreach { id =>
      val r = out(id)
      assert(r.getDouble(4) >= r.getDouble(3), r.toString)
      // k = ceil(n/5) with the default 20%
      assert(r.getLong(2) == (r.getLong(1) + 4) / 5, r.toString)
    }
    // the member's WORST trigrams still score far better than the OOV
    // doc's — the membership signal
    assert(out(1L).getDouble(4) < out(2L).getDouble(4),
      s"${out(1L)} vs ${out(2L)}")
    // unscored short doc: zero counts, null means
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(3) && out(3L).isNullAt(4))
    intercept[IllegalArgumentException](
      LanguageModel.minKProb(docs, "text", "doc_id", lm, kNum = 3, kDen = 2))
  }
}
