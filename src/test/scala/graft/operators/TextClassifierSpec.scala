package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Naive Bayes classifier: hand-computed log-joints, UNK handling,
  * argmax tie-break, empty-doc nulls, partition-order invariance. */
class TextClassifierSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("cls", StringType)))

  // ref: x: "a b", "a"; y: "b b b" → vocab [b, a] (freq desc), V+1 = 3,
  // denominators tot + 0.5·3 = 4.5 for both classes.
  // priors (1e-8 fixed-point floor): ln(2/3) → −40546511,
  // ln(1/3) → −109861229.
  private def model = TextClassifier.train(
    df(schema, Seq(Row(1L, "a b", "x"), Row(2L, "a", "x"), Row(3L, "b b b", "y"))),
    "text", "cls", vocabSize = 100)

  private def classify(corpus: Seq[(Long, String)]): Map[Long, Row] =
    TextClassifier.classify(
      df(StructType(schema.fields.take(2)), corpus.map { case (i, t) => Row(i, t) }),
      "text", "doc_id", model, addK = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("hand-computed log-joint scores and argmax") {
    val out = classify(Seq(10L -> "a b", 11L -> "z"))
    // "a b": x = −0.40546511 + ln(2.5/4.5) + ln(1.5/4.5) → −2.0919
    //        y = −1.09861229 + ln(0.5/4.5) + ln(3.5/4.5) → −3.5472
    assert(out(10L).getString(1) == "x")
    assert(out(10L).getDouble(2) == -2.0919)
    // OOV token → UNK floor in both classes; the prior decides
    assert(out(11L).getString(1) == "x")
    assert(out(11L).getDouble(2) == -2.6027)
  }

  test("model internals: sorted labels, fixed-point priors, per-class totals") {
    val m = model
    assert(m.labels.toSeq == Seq("x", "y"))
    assert(m.logPriorsFixed.toSeq == Seq(-40546511L, -109861229L))
    assert(m.totals.toSeq == Seq(3L, 3L))
    assert(m.vocabTokens.toSeq == Seq("b", "a"))
  }

  test("exact score tie resolves to the ascending label") {
    val m = TextClassifier.train(
      df(schema, Seq(Row(1L, "a", "y"), Row(2L, "a", "x"))),
      "text", "cls", vocabSize = 100)
    val out = TextClassifier.classify(
      df(StructType(schema.fields.take(2)), Seq(Row(10L, "a"))),
      "text", "doc_id", m).collect()
    assert(out.head.getString(1) == "x")
  }

  test("empty / whitespace-only documents keep null label and score") {
    val out = classify(Seq(20L -> "", 21L -> "  \n\t "))
    Seq(20L, 21L).foreach { id =>
      assert(out(id).isNullAt(1) && out(id).isNullAt(2), s"doc $id")
    }
  }

  test("null training labels are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      TextClassifier.train(
        df(schema, Seq(Row(1L, "a", "x"), Row(2L, "b", null))),
        "text", "cls")
    }
    assert(e.getMessage.contains("null values in label column"))
  }

  test("scores are invariant to corpus partitioning (order-independent DECIMAL sum)") {
    val corpus = (0L until 40L).map(i => i -> s"a b z${i % 5} b a")
    val m = model
    def run(parts: Int) = TextClassifier.classify(
      df(StructType(schema.fields.take(2)),
        corpus.map { case (i, t) => Row(i, t) }).repartition(parts),
      "text", "doc_id", m)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(run(1) == run(13))
  }

  test("chi2Terms: hand-computed contingency; ubiquitous terms dropped; topK ranks") {
    // 4 docs, 2 classes; "hot" only in class x docs, "all" everywhere,
    // "rare" in one y doc; repeated tokens collapse to doc-presence
    val d = df(schema, Seq(
      Row(1L, "hot hot all", "x"), Row(2L, "hot all", "x"),
      Row(3L, "all rare", "y"), Row(4L, "all", "y")))
    val out = TextClassifier.chi2Terms(d, "text", "doc_id", "cls",
      vocabSize = 10, topK = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // hot/x: a=2 b=0 c=0 d=2 → χ² = 4·(2·2−0)²/(2·2·2·2) = 4 exactly
    val hx = out(("x", "hot"))
    assert((hx.getLong(2), hx.getLong(3), hx.getLong(4), hx.getLong(5)) == ((2L, 0L, 0L, 2L)))
    assert(hx.getDouble(6) == 4.0 && hx.getInt(7) == 1)
    // symmetric for the y side: absence is as discriminative as presence
    assert(out(("y", "hot")).getDouble(6) == 4.0)
    // rare/y: a=1 b=0 c=1 d=2 → χ² = 4·(1·2−0)²/(1·3·2·2) = 16/12
    assert(math.abs(out(("y", "rare")).getDouble(6) - 16.0 / 12.0) < 1e-12)
    // "all" is in every doc (td = n) → null χ², dropped from the ranking
    assert(!out.contains(("x", "all")) && !out.contains(("y", "all")))
    // ranks are dense 1..k per label, ordered by χ² desc then term asc
    val xRanks = out.collect { case ((l, _), r) if l == "x" => (r.getInt(7), r.getString(1)) }
      .toSeq.sorted
    assert(xRanks.map(_._1) == (1 to xRanks.size))
    intercept[IllegalArgumentException](
      TextClassifier.chi2Terms(d, "text", "doc_id", "cls", vocabSize = 0))
    intercept[IllegalArgumentException](
      TextClassifier.chi2Terms(
        df(schema, Seq(Row(1L, "a", null))), "text", "doc_id", "cls"))
  }

  test("chi2Terms: single-label corpus yields no rankable terms (0/0 must not become NaN rank 1)") {
    // nc = n makes the denominator term (n−nc) zero; the degenerate-case
    // contract is null → dropped, not NaN → ranked first
    val d = df(schema, Seq(
      Row(1L, "hot all", "x"), Row(2L, "cold all", "x"), Row(3L, "hot warm", "x")))
    assert(TextClassifier.chi2Terms(d, "text", "doc_id", "cls",
      vocabSize = 10, topK = 5).count() == 0L)
  }

  test("uncertaintySample: margins equal the exact joint-score gaps; bottom-k order") {
    // symmetric 2-class model: priors equal, token stats mirrored, so a
    // doc seen only through mirrored tokens has margin exactly 0
    val sym = TextClassifier.train(
      df(schema, Seq(Row(1L, "a a", "x"), Row(2L, "b b", "y"))),
      "text", "cls", vocabSize = 100)
    val corpus = df(StructType(schema.fields.take(2)), Seq(
      Row(10L, "a a a"),   // strongly x: large margin
      Row(11L, "a"),       // weakly x: smaller margin
      Row(12L, "a b"),     // perfectly balanced: margin 0
      Row(13L, "z")))      // pure UNK under symmetric stats: margin 0
    val out = TextClassifier.uncertaintySample(corpus, "text", "doc_id", sym, k = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(12L, 13L, 11L, 10L),
      s"ascending margin, ties by id: $out")
    assert(out.take(2).forall(_._3 == 0L), "balanced and all-UNK docs have margin 0")
    assert(out.take(2).forall(_._2 == "x"), "tied best resolves to the ascending label")
    assert(out(2)._3 > 0L && out(3)._3 > out(2)._3, "margins strictly grow with evidence")
    // k truncates at the smallest margins
    val top2 = TextClassifier.uncertaintySample(corpus, "text", "doc_id", sym, k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top2 == Seq(12L, 13L))
    intercept[IllegalArgumentException](
      TextClassifier.uncertaintySample(corpus, "text", "doc_id", sym, k = 0))
  }

  test("uncertaintySample: margin matches classify's fixed-point joint table") {
    // the margin of a doc must equal the difference of the two label
    // scores classify reports (scale 1e4 after its round(…, 4))
    val corpus = df(StructType(schema.fields.take(2)), Seq(Row(20L, "a b")))
    val m = TextClassifier.uncertaintySample(corpus, "text", "doc_id", model, k = 1)
      .head().getLong(2)
    // hand values from the classify spec: x −2.0919, y −3.5472 at 4dp —
    // the unrounded fixed-point gap sits within 1e4 of the rounded one
    val approxGap = ((-2.0919 - (-3.5472)) * 1e8).round
    assert(math.abs(m - approxGap) <= 10000L, s"margin $m vs ~$approxGap")
  }
}
