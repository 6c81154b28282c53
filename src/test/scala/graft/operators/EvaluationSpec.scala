package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class EvaluationSpec extends SparkSpec {

  private val rankSchema = StructType(Seq(
    StructField("q", StringType), StructField("item", LongType),
    StructField("score", DoubleType), StructField("rel", BooleanType)))

  test("rankedEval: DCG/IDCG from gain literals, MRR, precision/recall at k") {
    val g = Evaluation.ndcgGains(3)
    val d = df(rankSchema, Seq(
      // query A ranked by score desc: items 1(rel),2,3(rel),4 — rank 4 is out of k=3
      Row("A", 1L, 9.0, true), Row("A", 2L, 8.0, false),
      Row("A", 3L, 7.0, true), Row("A", 4L, 6.0, true),
      // query B: nothing relevant
      Row("B", 1L, 5.0, false), Row("B", 2L, 4.0, false)))
    val out = Evaluation.rankedEval(d, "q", "item", "score", "rel", k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getLong(1) == 4L && a.getLong(2) == 3L, "n=4, n_rel=3")
    assert(a.getLong(3) == 2L, "hits within k=3: ranks 1 and 3")
    assert(a.getLong(4) == 1L && a.getLong(5) == 1000000000000L, "first rel at rank 1")
    assert(a.getLong(6) == g(0) + g(2), s"dcg = gain(1)+gain(3), got ${a.getLong(6)}")
    // n_rel=3 >= k: ideal is all three top slots
    assert(a.getLong(7) == g.sum, "idcg = prefix(3)")
    assert(a.getDouble(8) == (g(0) + g(2)).toDouble / g.sum.toDouble)
    assert(a.getDouble(9) == 2.0 / 3.0 && a.getDouble(10) == 2.0 / 3.0)
    val b = out("B")
    assert(b.isNullAt(4) && b.isNullAt(5) && b.isNullAt(7) && b.isNullAt(8) &&
      b.isNullAt(10), "no relevant item: rank/rr/idcg/ndcg/recall all NULL")
    assert(b.getLong(6) == 0L && b.getDouble(9) == 0.0, "dcg 0, precision 0")
  }

  test("rankedEval: score ties break by item ASC; n_rel < k shortens the ideal") {
    val g = Evaluation.ndcgGains(3)
    val d = df(rankSchema, Seq(
      // both score 5: item 7 ranks before item 9, so the relevant 9 is rank 2
      Row("Q", 9L, 5.0, true), Row("Q", 7L, 5.0, false), Row("Q", 8L, 1.0, false)))
    val r = Evaluation.rankedEval(d, "q", "item", "score", "rel", k = 3).collect().head
    assert(r.getLong(4) == 2L, s"tie-broken rank, got ${r.getLong(4)}")
    assert(r.getLong(5) == 500000000000L, "rr = 1e12 DIV 2")
    assert(r.getLong(6) == g(1) && r.getLong(7) == g(0),
      "dcg = gain(2); ideal for a single relevant item = gain(1)")
    intercept[IllegalArgumentException](
      Evaluation.rankedEval(d, "q", "item", "score", "rel", k = 0))
  }

  private val aucSchema = StructType(Seq(
    StructField("g", StringType), StructField("s", DoubleType),
    StructField("y", BooleanType)))

  test("rocAuc: rank-sum with ties counted half") {
    val d = df(aucSchema, Seq(
      Row("x", 3.0, true), Row("x", 2.0, true),   // positives
      Row("x", 1.0, false), Row("x", 2.0, false)))// negatives, one tied at 2.0
    val r = Evaluation.rocAuc(d, "g", "s", "y").collect().head
    // pos 3.0 beats both negs (2 wins); pos 2.0 beats 1.0, ties 2.0 (1 + ½)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 7L, s"auc_num2 = 2·(2+1.5), got ${r.getLong(3)}")
    assert(r.getDouble(4) == 7.0 / 8.0)
  }

  test("rocAuc: perfect separation = 1, reversed = 0, one-class group NULL") {
    val d = df(aucSchema, Seq(
      Row("sep", 5.0, true), Row("sep", 1.0, false),
      Row("rev", 1.0, true), Row("rev", 5.0, false),
      Row("mono", 2.0, true), Row("mono", 3.0, true)))
    val out = Evaluation.rocAuc(d, "g", "s", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("sep").getDouble(4) == 1.0)
    assert(out("rev").getDouble(4) == 0.0)
    assert(out("mono").isNullAt(4), "no negatives: AUC undefined")
  }

  private val clsSchema = StructType(Seq(
    StructField("t", StringType), StructField("p", StringType)))

  test("classifierEval: per-class P/R/F1 incl. pred-only and truth-only classes") {
    val d = df(clsSchema, Seq(
      Row("a", "a"), Row("a", "b"), Row("b", "b"), Row("c", "d")))
    val out = Evaluation.classifierEval(d, "t", "p")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "c", "d"), "label set = truth ∪ pred")
    val a = out("a") // truth 2, pred 1, tp 1
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == (2L, 1L, 1L))
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 0.5)
    assert(a.getDouble(6) == 2.0 * 1.0 * 0.5 / 1.5, "f1 = 2pr/(p+r)")
    val b = out("b") // truth 1, pred 2, tp 1
    assert(b.getDouble(4) == 0.5 && b.getDouble(5) == 1.0)
    val c = out("c") // never predicted: precision undefined, recall 0, f1 NULL
    assert(c.getLong(2) == 0L && c.isNullAt(4) && c.getDouble(5) == 0.0 && c.isNullAt(6))
    val dd = out("d") // pred-only: recall undefined
    assert(dd.getLong(1) == 0L && dd.getDouble(4) == 0.0 && dd.isNullAt(5) && dd.isNullAt(6))
  }

  private val calSchema = StructType(Seq(
    StructField("g", StringType), StructField("prob", DoubleType),
    StructField("y", BooleanType)))

  test("calibrationBins: exact counts, fixed-point gap, edge binning") {
    val d = df(calSchema, Seq(
      Row("m", 0.05, false), Row("m", 0.05, true),  // bin 0
      Row("m", 0.95, true), Row("m", 1.0, true),    // bin 9 (1.0 clamps down)
      Row("m", -0.2, false)))                        // below range: its own bin
    val out = Evaluation.calibrationBins(d, "g", "prob", "y", bins = 10)
      .collect().map(r => r.getLong(1) -> r).toMap
    val b0 = out(0L)
    assert(b0.getLong(2) == 2L && b0.getLong(3) == 1L)
    assert(b0.getLong(4) == 100000000L, "conf_fp = 2·⌊0.05e9⌋")
    assert(b0.getLong(5) == 900000000L, "gap = |1e8 − 1·1e9|")
    assert(b0.getDouble(6) == 0.05 && b0.getDouble(7) == 0.5)
    val b9 = out(9L)
    assert(b9.getLong(2) == 2L && b9.getLong(3) == 2L, "prob 1.0 joins bin 9")
    assert(out(-2L).getLong(2) == 1L, "negative prob surfaces, not folded into 0")
    intercept[IllegalArgumentException](
      Evaluation.calibrationBins(d, "g", "prob", "y", bins = 1))
  }

  private val kappaSchema = StructType(Seq(
    StructField("g", StringType), StructField("a", StringType),
    StructField("b", StringType)))

  test("cohenKappa: textbook 2x2 table gives exactly 0.4; constant raters NULL") {
    // 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no: po=0.7, pe=0.5, kappa=0.4
    val rows =
      Seq.fill(20)(Row("g1", "y", "y")) ++ Seq.fill(5)(Row("g1", "y", "n")) ++
      Seq.fill(10)(Row("g1", "n", "y")) ++ Seq.fill(15)(Row("g1", "n", "n")) ++
      Seq.fill(4)(Row("g2", "x", "x")) // both raters constant: chance explains all
    val out = Evaluation.cohenKappa(df(kappaSchema, rows), "g", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(g1.getLong(1) == 50L && g1.getLong(2) == 35L)
    assert(g1.getDecimal(3).longValueExact == 1250L, "pe_num = 25*30 + 25*20")
    assert(g1.getDouble(4) == 0.7 && g1.getDouble(5) == 0.5)
    assert(g1.getDouble(6) == 0.4, "kappa = (50*35-1250)/(2500-1250)")
    assert(out("g2").isNullAt(6), "n^2 == pe_num: kappa NULL, not 0/0")
  }

  test("mcnemar: discordant-pair chi2; no-discordance NULL") {
    val sch = StructType(Seq(StructField("g", StringType),
      StructField("ca", BooleanType), StructField("cb", BooleanType)))
    // both=2, a_only=3, b_only=1, neither=1 -> chi2 = (3-1)^2/4 = 1
    val rows = Seq.fill(2)(Row("g", true, true)) ++ Seq.fill(3)(Row("g", true, false)) ++
      Seq(Row("g", false, true), Row("g", false, false)) ++
      Seq(Row("tie", true, true), Row("tie", false, false)) // fully concordant
    val out = Evaluation.mcnemar(df(sch, rows), "g", "ca", "cb")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4), g.getLong(5)) ==
      ((7L, 2L, 3L, 1L, 1L)), g.toString)
    assert(g.getDouble(6) == 1.0)
    assert(out("tie").isNullAt(6), "no discordant pairs: no evidence, not chi2=0")
  }

  test("gwetAC1: stays high where the kappa paradox collapses; degenerate NULL") {
    // 90 pos/pos, 2 neg/neg, 4+4 disagreements: po = 0.92, but kappa's
    // chance term rewards the 94/6 imbalance (kappa ≈ 0.29) while AC1's
    // penalizes it: S = 188·12 + 12·188 = 4512, peden = 4·100²·1 = 40000,
    // pe = 0.1128, ac1 = (0.92 − 0.1128)/0.8872
    val rows =
      Seq.fill(90)(Row("g1", "pos", "pos")) ++ Seq.fill(2)(Row("g1", "neg", "neg")) ++
      Seq.fill(4)(Row("g1", "pos", "neg")) ++ Seq.fill(4)(Row("g1", "neg", "pos")) ++
      Seq.fill(3)(Row("g2", "x", "x")) // single category: AC1 undefined
    val out = Evaluation.gwetAC1(df(kappaSchema, rows), "g", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(g1.getLong(1) == 100L && g1.getLong(2) == 92L && g1.getLong(3) == 2L)
    assert(g1.getDouble(4) == 0.92 && g1.getDouble(5) == 0.1128, g1.toString)
    assert(math.abs(g1.getDouble(6) - (0.92 - 0.1128) / (1.0 - 0.1128)) < 1e-15)
    val kappa = Evaluation.cohenKappa(df(kappaSchema, rows), "g", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap.apply("g1").getDouble(6)
    assert(g1.getDouble(6) > kappa + 0.5, s"paradox case: ac1=${g1.getDouble(6)} kappa=$kappa")
    assert(out("g2").isNullAt(6), "one category: no chance model")
  }

  private val fleissSchema = StructType(Seq(
    StructField("item", LongType), StructField("cat", StringType)))

  test("fleissKappa: exact variable-rater formula, incl. negative kappa and m=1 items") {
    // items: 1:(A,A) 2:(A,B) -> A=2 D=4 pbar=.5; C_A=3 C_B=1 T=4 S=10
    // kappa = (2*16-4*10)/(4*(16-10)) = -8/24 = -1/3
    val two = df(fleissSchema, Seq(Row(1L, "A"), Row(1L, "A"),
      Row(2L, "A"), Row(2L, "B")))
    val r = Evaluation.fleissKappa(two, "item", "cat").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getDecimal(2).longValueExact == 2L && r.getDecimal(3).longValueExact == 4L &&
      r.getDecimal(4).longValueExact == 10L)
    assert(r.getDouble(5) == 0.5 && r.getDouble(6) == 0.625)
    assert(math.abs(r.getDouble(7) - (-1.0 / 3.0)) < 1e-15)
    // add a single-rating item: marginals move, agreement mass doesn't
    val ragged = df(fleissSchema, Seq(Row(1L, "A"), Row(1L, "A"),
      Row(2L, "A"), Row(2L, "B"), Row(3L, "B")))
    val r2 = Evaluation.fleissKappa(ragged, "item", "cat").head()
    assert(r2.getLong(0) == 3L && r2.getLong(1) == 5L)
    assert(r2.getDecimal(2).longValueExact == 2L && r2.getDecimal(3).longValueExact == 4L &&
      r2.getDecimal(4).longValueExact == 13L)
    assert(math.abs(r2.getDouble(7) - (-1.0 / 24.0)) < 1e-15,
      "kappa = (2*25-4*13)/(4*(25-13))")
  }

  test("rougeL: hand-computed LCS on non-subsequence pairs; truncation; empties") {
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("cand", StringType), StructField("ref", StringType)))
    val d = df(sch, Seq(
      Row(1L, "a b c d", "a x b y d"),  // LCS a,b,d = 3; P 3/4 R 3/5
      Row(2L, "c b a", "a b c"),        // pure reversal: LCS 1
      Row(3L, "a b", "a b"),            // identity: F 1
      Row(4L, "", "a b"),               // empty cand -> NULL ratios
      Row(5L, "x y", "p q")))           // disjoint: LCS 0 -> F 0.0
    val out = Evaluation.rougeL(d, "cand", "ref", "id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 4L && r1.getLong(3) == 5L)
    assert(r1.getDouble(4) == 0.75 && r1.getDouble(5) == 0.6)
    assert(math.abs(r1.getDouble(6) - 2.0 * 0.75 * 0.6 / 1.35) < 1e-15)
    assert(out(2L).getLong(1) == 1L, "reversal keeps only one in-order token")
    assert(out(3L).getDouble(6) == 1.0)
    assert(out(4L).getLong(1) == 0L && out(4L).isNullAt(4) && out(4L).isNullAt(6))
    assert(out(5L).getLong(1) == 0L && out(5L).getDouble(6) == 0.0)
    // truncation cap: with maxTokens=2 both sides clip to 2 tokens
    val t = Evaluation.rougeL(df(sch, Seq(Row(9L, "a b z", "a b q"))),
      "cand", "ref", "id", maxTokens = 2).head()
    assert(t.getLong(1) == 2L && t.getLong(2) == 2L && t.getLong(3) == 2L)
    intercept[IllegalArgumentException](
      Evaluation.rougeL(d, "cand", "ref", "id", maxTokens = 0))
  }

  test("krippendorffAlpha: hand-computed missing-data example; degenerate cases") {
    // items: 1:(a,a) fp=0 | 2:(a,b) disagree=2, fp=2e9 | 3:(b,b,b) fp=0
    // | 4:(a) drops (unpairable). T=7, D_o=2/7; marginals a=3 b=4,
    // S=25, D_e=(49-25)/42=4/7 -> alpha = 1 - (2/7)/(4/7) = 0.5 exactly
    val d = df(fleissSchema, Seq(
      Row(1L, "a"), Row(1L, "a"),
      Row(2L, "a"), Row(2L, "b"),
      Row(3L, "b"), Row(3L, "b"), Row(3L, "b"),
      Row(4L, "a")))
    val r = Evaluation.krippendorffAlpha(d, "item", "cat").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 7L)
    assert(r.getDouble(2) == 2.0 / 7.0 && r.getDouble(3) == 24.0 / 42.0)
    assert(r.getDouble(4) == 0.5, s"alpha: $r")
    // unanimous ratings: D_e = 0 -> alpha NULL (chance explains all)
    val agree = df(fleissSchema, Seq(Row(1L, "a"), Row(1L, "a"), Row(2L, "a"), Row(2L, "a")))
    val ra = Evaluation.krippendorffAlpha(agree, "item", "cat").head()
    assert(ra.getDouble(2) == 0.0 && ra.isNullAt(4))
    // nothing pairable: every stat NULL/zero, no crash
    val solo = Evaluation.krippendorffAlpha(
      df(fleissSchema, Seq(Row(1L, "a"), Row(2L, "b"))), "item", "cat").head()
    assert(solo.getLong(0) == 0L && solo.isNullAt(4))
  }

  test("fleissKappa: perfect agreement gives kappa 1; one item only -> pe=1 NULL") {
    val perfect = df(fleissSchema, Seq(Row(1L, "A"), Row(1L, "A"),
      Row(2L, "B"), Row(2L, "B")))
    assert(Evaluation.fleissKappa(perfect, "item", "cat").head().getDouble(7) == 1.0)
    val onecat = df(fleissSchema, Seq(Row(1L, "A"), Row(1L, "A")))
    assert(Evaluation.fleissKappa(onecat, "item", "cat").head().isNullAt(7),
      "T^2 == S: chance explains everything, kappa NULL")
  }

  private val bleuSchema = StructType(Seq(
    StructField("id", LongType), StructField("cand", StringType),
    StructField("ref", StringType)))

  test("ngramOverlap: clipped matches, totals from lengths, micro-average") {
    val d = df(bleuSchema, Seq(
      Row(1L, "a b x d", "a b c d"),   // n1: 3 match; n2: 1; n3: 0
      Row(2L, "a a a", "a b")))        // clipping: min(3,1)=1 unigram match
    val out = Evaluation.ngramOverlap(d, "cand", "ref", "id", maxN = 3)
      .collect().map(r => r.getInt(0) -> r).toMap
    val n1 = out(1)
    assert(n1.getLong(1) == 4L, "matches = 3 (doc1) + 1 clipped (doc2)")
    assert(n1.getLong(2) == 7L && n1.getLong(3) == 6L)
    assert(n1.getDouble(4) == 4.0 / 7.0 && n1.getDouble(5) == 4.0 / 6.0)
    val n2 = out(2)
    assert(n2.getLong(1) == 1L, """only "a b" survives at n=2""")
    assert(n2.getLong(2) == 5L && n2.getLong(3) == 4L)
    val n3 = out(3)
    assert(n3.getLong(1) == 0L && n3.getLong(2) == 3L && n3.getLong(3) == 2L)
    assert(n3.getDouble(4) == 0.0, "precision 0, not NULL, when grams exist")
  }

  test("ngramOverlap: case/whitespace normalization; doc shorter than n contributes 0 grams") {
    val d = df(bleuSchema, Seq(Row(1L, "  A    b ", "a B")))
    val out = Evaluation.ngramOverlap(d, "cand", "ref", "id", maxN = 4)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 2L)
    assert(out(2).getLong(1) == 1L, "bigram 'a b' matches after normalization")
    assert(out(3).getLong(1) == 0L && out(3).getLong(2) == 0L && out(3).getLong(3) == 0L)
    assert(out(3).isNullAt(4) && out(3).isNullAt(5), "no grams: NULL, not 0/0")
  }

  test("bleuSummary: perfect overlap = 1.0; brevity penalty branch; zero p_n floors to 0") {
    val same = df(bleuSchema, Seq(Row(1L, "a b c d e", "a b c d e")))
    val s1 = Evaluation.bleuSummary(
      Evaluation.ngramOverlap(same, "cand", "ref", "id", 4)).head()
    assert(s1.getAs[Double]("bleu") == 1.0 && s1.getAs[Double]("bp") == 1.0)
    // candidate a strict suffix: all precisions 1, bp = exp(1 - 5/4)
    val short = df(bleuSchema, Seq(Row(1L, "b c d e", "a b c d e")))
    val s2 = Evaluation.bleuSummary(
      Evaluation.ngramOverlap(short, "cand", "ref", "id", 4)).head()
    assert(s2.getAs[Long]("cand_tokens") == 4L && s2.getAs[Long]("ref_tokens") == 5L)
    assert(s2.getAs[Double]("p1") == 1.0 && s2.getAs[Double]("p4") == 1.0)
    assert(math.abs(s2.getAs[Double]("bleu") - math.exp(-0.25)) < 1e-9)
    // any zero precision: unsmoothed corpus BLEU is 0
    val broken = df(bleuSchema, Seq(Row(1L, "a x c y e", "a b c d e")))
    val s3 = Evaluation.bleuSummary(
      Evaluation.ngramOverlap(broken, "cand", "ref", "id", 4)).head()
    assert(s3.getAs[Double]("bleu") == 0.0)
  }

  private val confSchema = StructType(Seq(
    StructField("id", LongType), StructField("s", DoubleType)))

  test("conformalFlag: threshold is the ceil((n+1)(1-alpha))-th order statistic") {
    // calib = 1..100, alpha = 5% -> rank = ceil(101*95/100) = 96
    val calib = df(confSchema, (1 to 100).map(i => Row(i.toLong, i.toDouble)))
    val test0 = df(confSchema, Seq(Row(1L, 95.5), Row(2L, 96.0), Row(3L, 96.5)))
    val out = Evaluation.conformalFlag(calib, "s", test0, "s", 5, 100)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("threshold"), r.getAs[Boolean]("conforming"))).toMap
    assert(out(1L) == ((96.0, true)))
    assert(out(2L) == ((96.0, true)))
    assert(out(3L) == ((96.0, false)))
  }

  test("conformalFlag: rank beyond n (alpha too small for calib size) conforms all") {
    val calib = df(confSchema, (1 to 5).map(i => Row(i.toLong, i.toDouble)))
    // rank = ceil(6*95/100) = 6 > 5 -> null threshold, all conforming
    val test0 = df(confSchema, Seq(Row(1L, 1e9)))
    val out = Evaluation.conformalFlag(calib, "s", test0, "s", 5, 100).collect()
    assert(out(0).isNullAt(out(0).fieldIndex("threshold")))
    assert(out(0).getAs[Boolean]("conforming"))
    intercept[IllegalArgumentException](
      Evaluation.conformalFlag(calib, "s", test0, "s", 0, 100))
  }

  private val isoSchema = StructType(Seq(
    StructField("s", DoubleType), StructField("y", BooleanType)))

  /** Local PAV over (score → n, pos) with exact rational pooling. */
  private def pavRef(pts: Seq[(Double, Boolean)]): Seq[(Double, Double, Long, Long)] = {
    val grouped = pts.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, g) =>
      (s, s, g.size.toLong, g.count(_._2).toLong) }
    val st = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Long, Long)]
    grouped.foreach { b0 =>
      var b = b0
      while (st.nonEmpty && BigInt(st.last._4) * b._3 > BigInt(b._4) * st.last._3) {
        val p = st.remove(st.length - 1)
        b = (p._1, b._2, p._3 + b._3, p._4 + b._4)
      }
      st += b
    }
    st.toSeq
  }

  test("isotonicCalibrate: equals the local PAV reference on random data; monotone") {
    val rnd = new scala.util.Random(47)
    val pts = (0 until 400).map { _ =>
      val s = (rnd.nextInt(40) + 1) / 40.0
      (s, rnd.nextDouble() < s * 0.8 + 0.1) // noisy but increasing
    }
    val out = Evaluation.isotonicCalibrate(
        df(isoSchema, pts.map { case (s, y) => Row(s, y) }), "s", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == pavRef(pts))
    // rates strictly increase block to block (equal rates would pool)
    val rates = out.map(b => b._4.toDouble / b._3)
    assert(rates.zip(rates.drop(1)).forall { case (a, b) => a < b }, rates.toSeq)
    // mass is preserved
    assert(out.map(_._3).sum == 400L)
    assert(out.map(_._4).sum == pts.count(_._2).toLong)
  }

  test("applyCalibration: step lookup clamps below, extends above, nulls pass") {
    val pts = Seq((0.2, false), (0.2, true), (0.8, true))
    val blocks = Evaluation.isotonicCalibrate(
      df(isoSchema, pts.map { case (s, y) => Row(s, y) }), "s", "y")
    val probeSchema = StructType(Seq(
      StructField("id", LongType), StructField("s", DoubleType)))
    val out = Evaluation.applyCalibration(
        df(probeSchema, Seq(Row(1L, 0.0), Row(2L, 0.5), Row(3L, 9.9), Row(4L, null))),
        "s", blocks)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 500000000L, "below the first block clamps to it")
    assert(out(2L).getLong(2) == 500000000L)
    assert(out(3L).getLong(2) == 1000000000L, "beyond the last block extends it")
    assert(out(4L).isNullAt(2) && out(4L).isNullAt(3))
    intercept[IllegalArgumentException](
      Evaluation.applyCalibration(
        df(probeSchema, Seq(Row(1L, 0.0))), "s",
        blocks.filter("n < 0")))
  }

  test("isotonicCalibrate: already-monotone inputs pass through unpooled") {
    val pts = Seq((0.1, false), (0.2, false), (0.2, true), (0.3, true))
    val out = Evaluation.isotonicCalibrate(
        df(isoSchema, pts.map { case (s, y) => Row(s, y) }), "s", "y")
      .collect()
    assert(out.length == 3)
    assert(out.map(r => r.getLong(4)).toSeq == Seq(0L, 500000000L, 1000000000L))
    intercept[IllegalArgumentException](
      Evaluation.isotonicCalibrate(
        df(isoSchema, pts.map { case (s, y) => Row(s, y) }), "s", "y", maxBins = 2))
  }

  test("conformalFlag: null calibration scores are excluded from the rank") {
    // 10 real scores + 5 nulls; alpha = 10% -> rank over n=10 is
    // ceil(11*90/100) = 10 -> threshold = 10.0
    val calib = df(confSchema, (1 to 10).map(i => Row(i.toLong, i.toDouble)) ++
      (11 to 15).map(i => Row(i.toLong, null)))
    val test0 = df(confSchema, Seq(Row(1L, 10.0), Row(2L, 10.5)))
    val out = Evaluation.conformalFlag(calib, "s", test0, "s", 10, 100)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("conforming")).toMap
    assert(out == Map(1L -> true, 2L -> false))
  }

  private val brierSchema = StructType(Seq(StructField("g", StringType),
    StructField("p", DoubleType), StructField("y", BooleanType)))

  test("brierDecomposition: bin-constant forecasts make Murphy's identity exact") {
    // bin 2 (p=0.25): 1 of 4 positive -> perfectly calibrated;
    // bin 7 (p=0.75): 3 of 4 positive -> perfectly calibrated.
    // reliability 0, resolution 0.0625, uncertainty 0.25, brier 0.1875
    // = rel - res + unc EXACTLY (forecasts constant within bins)
    val rows = Seq(
      Row("a", 0.25, true), Row("a", 0.25, false), Row("a", 0.25, false),
      Row("a", 0.25, false),
      Row("a", 0.75, true), Row("a", 0.75, true), Row("a", 0.75, true),
      Row("a", 0.75, false))
    val r = Evaluation.brierDecomposition(df(brierSchema, rows), "g", "p", "y")
      .collect().head
    assert(r.getLong(1) == 8L)
    assert(r.getDouble(2) == 0.1875, s"brier=${r.getDouble(2)}")       // exact dyadics
    assert(r.getDouble(3) == 0.25 && r.getDouble(4) == 0.0 &&
      r.getDouble(5) == 0.0625, r.toString)
    assert(r.getDouble(2) == r.getDouble(4) - r.getDouble(5) + r.getDouble(3))
  }

  test("brierDecomposition: a constant off-base-rate forecast is pure reliability") {
    // everyone forecast 0.5, base rate 0.25: resolution 0 (one bin),
    // reliability (0.5-0.25)^2 = 0.0625, uncertainty 0.1875
    val rows = Seq(Row("b", 0.5, true), Row("b", 0.5, false),
      Row("b", 0.5, false), Row("b", 0.5, false))
    val r = Evaluation.brierDecomposition(df(brierSchema, rows), "g", "p", "y")
      .collect().head
    assert(r.getDouble(4) == 0.0625 && r.getDouble(5) == 0.0 &&
      r.getDouble(3) == 0.1875, r.toString)
    // p=1.0 clamps into the top bin; null rows drop
    val edge = Seq(Row("c", 1.0, true), Row("c", 0.95, true),
      Row("c", null, true), Row("c", 0.95, null))
    val e = Evaluation.brierDecomposition(df(brierSchema, edge), "g", "p", "y")
      .collect().head
    assert(e.getLong(1) == 2L && e.getDouble(5) == 0.0)
    intercept[IllegalArgumentException](Evaluation.brierDecomposition(
      df(brierSchema, rows), "g", "p", "y", bins = 1))
  }
}
